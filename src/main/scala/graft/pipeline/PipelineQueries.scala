package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-contract registration of the phase-4 pipeline operators
  * (SURVEY.md §7). Oracles are provided wherever DuckDB can express the
  * same computation; signature/LSH operators get the weaker rows-only check.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String) = Tables.df(s, dir, "documents")
  private def embs(s: SparkSession, dir: String) = Tables.df(s, dir, "embeddings")

  private def queryVec(s: SparkSession, dir: String): Seq[Float] =
    embs(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, dir) => Dedup.exact(docs(s, dir))),
    "q_dedup_minhash" -> ((s, dir) => Dedup.minhashPairs(docs(s, dir), threshold = 0.3)),
    "q_dedup_simhash" -> ((s, dir) => Dedup.simhashPairs(docs(s, dir), maxHamming = 8)),
    "q_dedup_ngram" -> ((s, dir) => Dedup.ngramJaccardPairs(docs(s, dir), n = 3, threshold = 0.2)),
    "q_dedup_embed" -> ((s, dir) => Dedup.embeddingNearDupPairs(embs(s, dir), threshold = 0.9)),
    "q_ann_brute" -> ((s, dir) => Similarity.bruteForceTopK(embs(s, dir), queryVec(s, dir), k = 10)),
    "q_ann_lsh" -> ((s, dir) => Similarity.lshTopK(embs(s, dir), queryVec(s, dir), k = 10)),
    "q_text_tokens" -> ((s, dir) => TextAnalysis.tokenStats(docs(s, dir))),
    "q_text_quality" -> ((s, dir) => TextAnalysis.qualityScore(docs(s, dir))),
    "q_text_langid" -> ((s, dir) => TextAnalysis.langIdGuess(docs(s, dir))),
    "q_text_lang_dist" -> ((s, dir) => TextAnalysis.langDistribution(docs(s, dir))),
    "q_text_fingerprint" -> ((s, dir) => TextAnalysis.fingerprints(docs(s, dir))),
    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal.withPayload(docs(s, dir)).select("doc_id", "n_bytes", "sha256_hex")),
    "q_multimodal_decode" -> ((s, dir) => Multimodal.decodeStub(docs(s, dir)).toDF())
  )

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" -> ("SELECT min(doc_id) AS keep_id, count(*) AS n_copies, text " +
      "FROM documents GROUP BY text"),
    "q_text_quality" -> ("SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars, " +
      "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INTEGER) AS n_words, " +
      "round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / (length(text) - length(replace(text, ' ', '')) + 1), 4) AS avg_word_len, " +
      "CAST((length(lower(text)) - length(replace(lower(text), 'the', ''))) / 3 AS INTEGER) AS the_count, " +
      "round(CAST((length(lower(text)) - length(replace(lower(text), 'the', ''))) / 3 AS DOUBLE) / (length(text) - length(replace(text, ' ', '')) + 1), 4) AS stopword_ratio " +
      "FROM documents"),
    "q_text_lang_dist" -> "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang",
    "q_multimodal_meta" -> ("SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes, " +
      "sha256(text) AS sha256_hex FROM documents")
  )
}
