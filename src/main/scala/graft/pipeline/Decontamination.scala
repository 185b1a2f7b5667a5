package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Eval-set decontamination — the step that keeps benchmark answers out of
  * the training corpus: flag (and drop) training documents sharing word
  * n-grams with any evaluation document. The standard recipe (13-gram
  * overlap in GPT-3's appendix; n is a parameter here) reduced to two
  * relational passes:
  *
  *   1. shingle both corpora into word n-grams (map-side: split + slice +
  *      join, all codegen'd built-ins — no UDF in the hot path);
  *   2. equi-join train shingles against the DISTINCT eval shingles and
  *      count distinct hits per train doc.
  *
  * Scale shape: the join key is the shingle, so the heavy side shuffles
  * once on it; the eval side is typically benchmark-sized and broadcasts
  * (AQE decides). At 100 TB the lever is key width — map each shingle to
  * `xxhash64(shingle)` on BOTH sides before the join to cut shuffle bytes
  * ~10× (a 64-bit collision flags a clean doc spuriously with negligible
  * probability, acceptable for a drop-list); kept as exact strings here so
  * an external engine can replay the report byte for byte.
  */
object Decontamination {

  /** The semantic tie rule negates the eval id (max over (cosine, -id) ≡
    * rank by cosine DESC then id ASC), so a string id would fail at
    * runtime deep in the job under ANSI mode — reject it loudly at the
    * API edge instead.
    */
  private def requireNumericEvalId(
      evalDocs: DataFrame, evalIdCol: String, op: String): Unit = {
    val dt = evalDocs.schema(evalIdCol).dataType
    require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$op: evalIdCol '$evalIdCol' must be numeric (the nearest-eval tie " +
        s"rule negates it), got ${dt.simpleString}")
  }

  /** Word n-gram shingles of the lowercased text — same definition as
    * [[graft.functions.WordShingles]] (split on single spaces, n
    * consecutive words re-joined by a space); docs shorter than n words
    * yield none. The CASE guards Spark's `sequence(1, 0)` producing a
    * DESCENDING [1, 0] rather than an empty array.
    */
  private def shinglesOfWords(words: Column, n: Int): Column =
    TextAnalysis.shinglesOfWords(words, n)

  /** Explodes `textCol`'s shingles through the JVM-speed
    * [[graft.functions.WordShingleHashes]] generator — one tokenization
    * per row with no interpreted HOF in the corpus-wide fan-out (the r12
    * lesson). Hash-keyed callers (`withHashes = true`) get `__sh` ALONE
    * (the hash is bit-equal to `xxhash64` of the span string,
    * parity-tested in CurationSpec) — every such caller keys on the hash
    * and never reads the string, so since r21 the span column is not
    * built at all. String-keyed callers pass `withHashes = false` and get
    * `__s` alone, skipping the per-shingle XXH64 instead (ADVICE r15 —
    * the unhashed paths were computing and discarding it).
    */
  private def explodedShingles(
      df: DataFrame, textCol: String, n: Int, keep: Seq[Column],
      withHashes: Boolean = true): DataFrame =
    df.select(keep :+
      graft.functions.WordShingleHashesFunction
        .wordShingleHashes(col(textCol), n, withHashes, withSpans = !withHashes)
        .as(if (withHashes) Seq("__sh") else Seq("__s")): _*)

  /** One row per CONTAMINATED training doc: (`idCol`, n_shared) where
    * n_shared counts the distinct n-gram shingles the doc shares with the
    * eval corpus. Clean docs are absent (n_shared = 0).
    */
  def contaminationReport(
      train: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      hashed: Boolean = false): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(Seq(train, evalDocs).forall(d =>
        !d.columns.contains("__sh") && !d.columns.contains("__s")),
      "__sh/__s are reserved by Decontamination")
    // the 100 TB form: join on the 64-bit hash of the shingle instead of
    // the string — a 5-gram averages ~30 bytes, so hashing cuts the
    // distinct + join shuffle bytes ~4× (and more for larger n); a
    // collision can only ADD a spurious flag (never hide a real one), with
    // ~n_shingles²/2⁶⁴ probability
    // hashed=true keys on the generator's precomputed __sh (≡ xxhash64(__s));
    // hashed=false skips the hash pass entirely (withHashes threads down)
    val key: Column = if (hashed) col("__sh") else col("__s")
    val evalShingles = explodedShingles(evalDocs, textCol, n, keep = Nil, withHashes = hashed)
      .select(key.as("shingle")).distinct()
    val trainShingles = explodedShingles(train, textCol, n, keep = Seq(col(idCol)),
        withHashes = hashed)
      .select(col(idCol), key.as("shingle"))
    // join BEFORE deduplicating the train side: the eval set is small
    // (benchmark-sized), so the join broadcasts and filters ~every train
    // shingle map-side — only the matching (doc, shingle) pairs (tiny)
    // reach the distinct's shuffle. Deduplicating the train side first
    // would shuffle the ENTIRE corpus's shingle strings, which measured
    // 2.4× slower at sf0.1 and grows with the corpus, not the overlap.
    trainShingles.join(evalShingles, "shingle")
      .distinct()
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** SEMANTIC decontamination — the leak detector n-grams cannot see: a
    * paraphrased / translated / reformatted benchmark item shares no
    * shingles with the original but sits next to it in embedding space
    * (the geometry SemDeDup applies corpus-internally, pointed at an eval
    * set instead). Per training doc: the maximum cosine similarity to any
    * eval item and that nearest item's id; docs below `minCosine` are
    * absent (the [[contaminationReport]] convention).
    *
    * Scale shape: eval sets are benchmark-sized, so the eval side
    * BROADCASTS and scoring is pure map-side codegen (native
    * CosineSimilarity) over the corpus — no corpus-vector shuffle; the
    * per-doc max is a partial-aggregating `max(struct)` so only one row
    * per (doc × partition) reaches the exchange. Ties on the (6-decimal
    * rounded) cosine resolve to the SMALLEST eval id — deterministic and
    * replayable by any engine with a window rank. `evalIdCol` must be
    * numeric (the tie-break negates it).
    */
  def semanticReport(
      train: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      vecCol: String,
      evalIdCol: String,
      minCosine: Double = 0.0): DataFrame = {
    require(!train.columns.contains("__qvec") && !train.columns.contains("__q"),
      "__qvec/__q are reserved by semanticReport")
    requireNumericEvalId(evalDocs, evalIdCol, "semanticReport")
    val q = evalDocs.select(col(evalIdCol).as("__q"), col(vecCol).as("__qvec"))
    train.select(col(idCol), col(vecCol))
      .join(broadcast(q))
      .select(col(idCol),
        round(graft.functions.VectorFunctions.cosineSimilarity(
          col(vecCol), col("__qvec")), 6).as("__cos"),
        col("__q"))
      // max over a (cosine, -evalId) struct == rank by cosine DESC then
      // eval id ASC — one bounded aggregate, never a corpus-wide window
      .groupBy(col(idCol))
      .agg(max(struct(col("__cos"), (-col("__q")).as("__nq"))).as("__m"))
      .select(col(idCol), col("__m.__cos").as("max_cosine"),
        (-col("__m.__nq")).as("nearest_eval"))
      .filter(col("max_cosine") >= minCosine)
  }

  /** The PAIR-LEVEL audit trail: one row per (train doc, eval doc) pair
    * sharing at least one n-gram, with the distinct shared-shingle
    * count — the provenance report that turns a contamination incident
    * into a diff (WHICH benchmark item leaked into WHICH document,
    * feeding both the drop list and the eval-integrity call).
    * [[contaminationReport]] is this table's per-train marginal,
    * [[evalExposureReport]] its per-eval one. Same broadcast-eval
    * join-before-distinct discipline: only matched (train, eval,
    * shingle) triples — bounded by the overlap, not the corpus — reach
    * the exchange.
    */
  def contaminationPairs(
      train: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      hashed: Boolean = false): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(Seq(train, evalDocs).forall(d =>
        !d.columns.contains("__sh") && !d.columns.contains("__s")),
      "__sh/__s are reserved by Decontamination")
    val key: Column = if (hashed) col("__sh") else col("__s")
    val evalShingles = explodedShingles(evalDocs, textCol, n,
        keep = Seq(col(idCol)), withHashes = hashed)
      .select(col(idCol).as("eval_id"), key.as("shingle")).distinct()
    val trainShingles = explodedShingles(train, textCol, n,
        keep = Seq(col(idCol)), withHashes = hashed)
      .select(col(idCol).as("train_id"), key.as("shingle"))
    trainShingles.join(broadcast(evalShingles), Seq("shingle"))
      .select(col("train_id"), col("eval_id"), col("shingle")).distinct()
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The SEMANTIC [[evalExposureReport]] — the same question from the
    * BENCHMARK'S side that [[semanticReport]] answers from the corpus
    * side: per eval item, how many training docs sit within `minCosine`
    * of it in embedding space, and the closest one (rounded cosine +
    * id, ties to the smallest train id — the shared tie rule). The
    * report that decides whether an eval stays usable after a leak:
    * one paraphrase in the corpus is a drop; ten thousand mean the
    * benchmark is effectively memorized. Unexposed eval items are
    * absent (the [[evalExposureReport]] convention).
    *
    * Same scale shape as [[semanticReport]]: broadcast-eval map-side
    * codegen scoring over the corpus, the pair-level `minCosine` gate
    * BEFORE the exchange — so the aggregate (keyed by the benchmark-
    * sized eval id) sees flagged pairs only, never the corpus.
    */
  def semanticExposureReport(
      train: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      vecCol: String,
      evalIdCol: String,
      minCosine: Double): DataFrame = {
    require(!train.columns.contains("__qvec") && !train.columns.contains("__q"),
      "__qvec/__q are reserved by semanticExposureReport")
    requireNumericEvalId(evalDocs, evalIdCol, "semanticExposureReport")
    // the tie rule negates the TRAIN id here (nearest_train)
    val tdt = train.schema(idCol).dataType
    require(tdt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"semanticExposureReport: idCol '$idCol' must be numeric (the " +
        s"nearest-train tie rule negates it), got ${tdt.simpleString}")
    val q = evalDocs.select(col(evalIdCol).as("__q"), col(vecCol).as("__qvec"))
    train.select(col(idCol), col(vecCol))
      .join(broadcast(q))
      .select(col("__q"), col(idCol),
        round(graft.functions.VectorFunctions.cosineSimilarity(
          col(vecCol), col("__qvec")), 6).as("__cos"))
      .filter(col("__cos") >= minCosine)
      .groupBy(col("__q"))
      .agg(count(lit(1)).as("n_train_docs"),
        max(struct(col("__cos"), (-col(idCol)).as("__nid"))).as("__m"))
      .select(col("__q").as("eval_id"), col("n_train_docs"),
        col("__m.__cos").as("max_cosine"), (-col("__m.__nid")).as("nearest_train"))
  }

  /** The SEMANTIC pair table — [[contaminationPairs]]' embedding-space
    * sibling: one row per (train doc, eval doc) pair whose cosine clears
    * `minCosine`, with the (6-decimal rounded) cosine. [[semanticReport]]
    * is its per-train argmax, [[semanticExposureReport]] its per-eval
    * aggregate. Broadcast-eval map-side scoring with the pair gate
    * applied BEFORE anything shuffles; the output is bounded by the
    * flagged overlap, not the corpus×eval product — size the threshold
    * accordingly (a low threshold over a large corpus IS the cross
    * product).
    */
  def semanticContaminationPairs(
      train: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      vecCol: String,
      evalIdCol: String,
      minCosine: Double): DataFrame = {
    require(!train.columns.contains("__qvec") && !train.columns.contains("__q"),
      "__qvec/__q are reserved by semanticContaminationPairs")
    val q = evalDocs.select(col(evalIdCol).as("__q"), col(vecCol).as("__qvec"))
    train.select(col(idCol), col(vecCol))
      .join(broadcast(q))
      .select(col(idCol).as("train_id"), col("__q").as("eval_id"),
        round(graft.functions.VectorFunctions.cosineSimilarity(
          col(vecCol), col("__qvec")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** [[semanticReport]] through the IVF index — the CORPUS-SCALE form:
    * the broadcast variant evaluates |corpus| × |eval| cosines in one
    * map-side pass, which is exact but stops scaling when the eval set
    * grows past benchmark size (the compute product, before the 8 GB
    * broadcast ceiling). Here the TRAIN corpus is pre-indexed by
    * [[Similarity.buildIvfIndex]] (partitioned by centroid id), each
    * eval item probes only its `nprobe` nearest centroid partitions, and
    * — the decontamination-specific lever — the `minCosine` gate applies
    * PER PAIR map-side, so only flagged (train, eval) pairs reach the
    * per-doc max aggregate. The corpus side of the plan is scan →
    * broadcast join → project → filter → partial aggregate: NO corpus
    * vector ever shuffles (the one exchange carries flagged id/cosine
    * triples), and the index build is the one corpus shuffle, amortized
    * across every eval set probed against it.
    *
    * Exactness: with `nprobe` ≥ the index's centroid count every train
    * row scores against every eval item exactly once, and the result is
    * row-for-row [[semanticReport]] (the gated query pins this); with
    * `nprobe` below it the report is approximate in the usual IVF sense —
    * a leak whose eval item did not probe the doc's partition is missed,
    * the recall/nprobe trade the planted-cluster spec measures.
    *
    * `corpusFilter` restricts which indexed rows count as training docs
    * (e.g. an index built over a table holding both sides); `evalIdCol`
    * must be numeric (the [[semanticReport]] tie rule negates it). The
    * probe list (eval × nprobe rows with vectors) broadcasts; an eval
    * set beyond THAT ceiling splits into broadcast-sized slices whose
    * reports union and re-aggregate with the same max(struct) — each
    * slice replays this exact plan.
    */
  def semanticReportIvf(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      evalDocs: DataFrame,
      idCol: String,
      vecCol: String,
      evalIdCol: String,
      minCosine: Double,
      nprobe: Int,
      corpusFilter: Column = lit(true)): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val cos = graft.functions.VectorFunctions.cosineSimilarity _
    val idxCols = spark.read.parquet(indexPath).columns.toSet
    require(Seq(idCol, vecCol, "cid").forall(idxCols),
      s"semanticReportIvf: the index at $indexPath must carry '$idCol', " +
        s"'$vecCol' and 'cid' — found [${idxCols.mkString(", ")}]; build it " +
        "with Similarity.buildIvfIndex over the training corpus")
    require(!idxCols.exists(Set("__q", "__qvec", "__cos", "__m")),
      "__q/__qvec/__cos/__m are reserved by semanticReportIvf")
    requireNumericEvalId(evalDocs, evalIdCol, "semanticReportIvf")
    val q = evalDocs.select(col(evalIdCol).as("__q"), col(vecCol).as("__qvec"))
    // rank the (tiny, broadcast) centroid table per eval item; the window
    // shuffles eval × nlist rows — eval-sized, never the corpus
    val centroids = spark.read.parquet(indexPath + "__centroids")
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__q")).orderBy(col("__ccos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__ccos", cos(col("centroid"), col("__qvec")))
      .withColumn("__cr", row_number().over(probeW))
      .filter(col("__cr") <= nprobe)
      .select(col("cid"), col("__q"), col("__qvec"))
    // cid is the index's PARTITION column: the broadcast probe join prunes
    // the scan to probed directories, scoring stays map-side codegen, and
    // the pair-level threshold keeps clean pairs out of the exchange
    val flagged = spark.read.parquet(indexPath).filter(corpusFilter)
      .join(broadcast(probes), Seq("cid"))
      .select(col(idCol),
        round(cos(col(vecCol), col("__qvec")), 6).as("__cos"), col("__q"))
      .filter(col("__cos") >= minCosine)
    // same aggregate (and tie rule) as [[semanticReport]]: filtering
    // pairs first is equivalent — the max pair survives its own gate
    flagged.groupBy(col(idCol))
      .agg(max(struct(col("__cos"), (-col("__q")).as("__nq"))).as("__m"))
      .select(col(idCol), col("__m.__cos").as("max_cosine"),
        (-col("__m.__nq")).as("nearest_eval"))
  }

  /** [[semanticReportIvf]] for eval sets beyond even the PROBE-broadcast
    * ceiling (eval × nprobe vectors): the eval set splits into `slices`
    * deterministic hash slices and each slice runs as its OWN job whose
    * report lands under `scratchDir` — sequential actions, so at most one
    * slice's probe broadcast is alive at a time (a lazy union of slice
    * plans would hold every broadcast simultaneously and buy nothing).
    * The slice reports then re-aggregate with the same max(struct) tie
    * rule, which is associative across slices — result ≡ the unsliced
    * form (spec-pinned). Corpus cost: `slices` partition-pruned passes
    * over the probed fraction; per-doc flagged rows per slice, not the
    * corpus, reach the final aggregate.
    */
  def semanticReportIvfSliced(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      evalDocs: DataFrame,
      idCol: String,
      vecCol: String,
      evalIdCol: String,
      minCosine: Double,
      nprobe: Int,
      slices: Int,
      scratchDir: String,
      corpusFilter: Column = lit(true)): DataFrame = {
    require(slices >= 1, s"slices must be >= 1, got $slices")
    require(scratchDir.nonEmpty, "semanticReportIvfSliced needs a scratchDir " +
      "for the per-slice reports (each slice is its own job)")
    (0 until slices).foreach { i =>
      semanticReportIvf(spark, indexPath,
        evalDocs.filter(pmod(xxhash64(col(evalIdCol)), lit(slices)) === i),
        idCol, vecCol, evalIdCol, minCosine, nprobe, corpusFilter)
        // overwrite on the first slice clears a stale scratch dir; later
        // slices append — each write is the slice's materializing action
        .write.mode(if (i == 0) "overwrite" else "append").parquet(scratchDir)
    }
    spark.read.parquet(scratchDir)
      .groupBy(col(idCol))
      .agg(max(struct(col("max_cosine"), (-col("nearest_eval")).as("__nq"))).as("__m"))
      .select(col(idCol), col("__m.max_cosine").as("max_cosine"),
        (-col("__m.__nq")).as("nearest_eval"))
  }

  /** [[semanticReportIvf]] as a drop over the caller's training frame —
    * the [[dropSemanticContaminated]] shape at index scale.
    */
  def dropSemanticContaminatedIvf(
      train: DataFrame,
      indexPath: String,
      evalDocs: DataFrame,
      idCol: String,
      vecCol: String,
      evalIdCol: String,
      minCosine: Double,
      nprobe: Int,
      corpusFilter: Column = lit(true)): DataFrame =
    train.join(
      semanticReportIvf(train.sparkSession, indexPath, evalDocs, idCol,
        vecCol, evalIdCol, minCosine, nprobe, corpusFilter)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** [[semanticReport]] as a drop: training rows whose nearest eval item
    * scores at or above `minCosine` are removed (anti join on the flagged
    * ids — the [[dropContaminated]] shape).
    */
  def dropSemanticContaminated(
      train: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      vecCol: String,
      evalIdCol: String,
      minCosine: Double): DataFrame =
    train.join(
      semanticReport(train, evalDocs, idCol, vecCol, evalIdCol, minCosine)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** The reverse direction of [[contaminationReport]] — per EVAL item, how
    * exposed is it in the training corpus: the number of distinct training
    * docs sharing at least one n-gram with it, and the number of its own
    * distinct shingles that leak. The benchmark-integrity report ("which
    * eval questions has the model effectively seen, and how often") that
    * decides whether an eval stays usable after a contamination incident;
    * unexposed eval items are absent.
    *
    * Shape: the same broadcast-eval + join-before-distinct discipline as
    * [[contaminationReport]]; the two exposure counts aggregate in
    * SEPARATE branches over the (tiny) matched-pair stream and join back
    * on eval id — one `count_distinct` pair in a single aggregation would
    * plan an Expand that doubles the stream (the duplicatedSpans lesson).
    */
  def evalExposureReport(
      train: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      hashed: Boolean = false): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(Seq(train, evalDocs).forall(d =>
        !d.columns.contains("__sh") && !d.columns.contains("__s")),
      "__sh/__s are reserved by Decontamination")
    val key: Column = if (hashed) col("__sh") else col("__s")
    val evalShingles = explodedShingles(evalDocs, textCol, n, keep = Seq(col(idCol)),
        withHashes = hashed)
      .select(col(idCol).as("eval_id"), key.as("shingle")).distinct()
    val trainShingles = explodedShingles(train, textCol, n, keep = Seq(col(idCol)),
        withHashes = hashed)
      .select(col(idCol).as("__train_id"), key.as("shingle"))
    val pairs = Dedup.cache(trainShingles
      .join(broadcast(evalShingles), Seq("shingle"))
      .select(col("eval_id"), col("__train_id"), col("shingle"))
      .distinct())
    val docsHit = pairs.select(col("eval_id"), col("__train_id")).distinct()
      .groupBy(col("eval_id")).agg(count(lit(1)).as("n_train_docs"))
    val shinglesHit = pairs.select(col("eval_id"), col("shingle")).distinct()
      .groupBy(col("eval_id")).agg(count(lit(1)).as("n_shingles_leaked"))
    docsHit.join(shinglesHit, Seq("eval_id"))
  }

  /** SPAN-LEVEL decontamination — the surgical alternative to
    * [[dropContaminated]]'s whole-document drop: real pipelines often
    * MASK the leaked n-gram span and keep the rest of the document (a
    * 10k-word page should not vanish over one quoted benchmark
    * sentence). One row per CONTAMINATED training doc: `masked_text`
    * (every word covered by any eval-matching n-gram replaced with
    * `maskToken`, all other words byte-identical) and `n_masked_words`.
    * Clean docs are absent (the [[contaminationReport]] convention) —
    * callers union the masked rows back over an anti-join, or join on
    * the id to patch in place.
    *
    * Scale shape: the corpus-wide fan-out runs through the JVM-speed
    * [[graft.functions.WordShingleHashes]] generator WITH its 0-based
    * span position (no interpreted HOF on the hot path — the r12
    * lesson); the broadcast eval join keeps only matching (doc, pos)
    * pairs, so the per-doc hit-set aggregate shuffles flagged positions
    * only; the word-by-word mask rebuild (a HOF chain) runs over the
    * CONTAMINATED docs alone, after the inner join. Masking replaces
    * word-for-word, so positions never shift — `maskToken` must itself
    * be a single space-free token for the same reason.
    */
  def maskContaminatedSpans(
      train: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      maskToken: String = "<mask>"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(maskToken.nonEmpty && !maskToken.contains(" "),
      s"maskToken must be one space-free token, got '$maskToken'")
    require(Seq(train, evalDocs).forall(d =>
        !d.columns.exists(Set("__s", "__pos", "__hits", "__shingle"))),
      "__s/__pos/__hits/__shingle are reserved by maskContaminatedSpans")
    val evalShingles = explodedShingles(evalDocs, textCol, n, keep = Nil,
        withHashes = false)
      .select(col("__s").as("__shingle")).distinct()
    val positioned = train.select(col(idCol),
      graft.functions.WordShingleHashesFunction
        .wordShingleHashes(col(textCol), n, withHashes = false, withPos = true)
        .as(Seq("__pos", "__s")))
    val hits = positioned
      .join(broadcast(evalShingles), col("__s") === col("__shingle"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("__pos"))).as("__hits"))
    // positions index the plain space-split of the ORIGINAL text — the
    // lowercased tokenization splits at the same offsets, so the mask
    // lands on the original-case words
    val words = split(col(textCol), " ")
    val idxs = sequence(lit(0), size(words) - 1)
    val covered = (i: Column) =>
      exists(col("__hits"), h => i >= h && i < h + n)
    train.join(hits, Seq(idCol)) // inner: contaminated docs only
      .select(col(idCol),
        array_join(
          zip_with(words, idxs,
            (w, i) => when(covered(i), lit(maskToken)).otherwise(w)),
          " ").as("masked_text"),
        size(filter(idxs, covered)).cast("long").as("n_masked_words"))
  }

  /** `train` minus every doc whose shared-shingle count exceeds
    * `maxShared` (default 0: any overlap drops the doc). Left-anti on the
    * id — linear in the corpus.
    */
  def dropContaminated(
      train: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      maxShared: Long = 0L): DataFrame = {
    val flagged = contaminationReport(train, evalDocs, idCol, textCol, n)
      .filter(col("n_shared") > maxShared)
      .select(col(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** The distinct xxhash64'd shingles of an eval corpus, collected to the
    * driver — the bounded prep step for [[dropContaminatedStreaming]]. An
    * eval set is benchmark-sized (thousands of docs), so its distinct
    * shingle hashes are a few MB; this is the same bounded-collect class as
    * the ANN centroid table, NOT a corpus-sized collect.
    */
  def evalShingleHashes(evalDocs: DataFrame, textCol: String, n: Int): Array[Long] =
    explodedShingles(evalDocs, textCol, n, keep = Nil)
      .select(col("__sh").as("h")).distinct()
      .collect().map(_.getLong(0)).sorted

  /** Ingestion-time decontamination: a PURE map-side gate (per-row
    * `arrays_overlap` of the doc's hashed shingles against the eval-set
    * hash array) that composes onto a STREAM with zero state — the
    * per-batch cost is ∝ batch size, like the other streaming curation
    * gates. Semantics ≡ `dropContaminated(..., maxShared = 0)` modulo the
    * 64-bit hash (a collision can only drop a clean doc spuriously, with
    * ~n²/2⁻⁶⁴ probability). For eval sets beyond ~10⁶ shingles, prefer the
    * stream-static left_anti join over a bucketed shingle table — same
    * statelessness, no literal-size concern.
    */
  def dropContaminatedStreaming(
      docs: DataFrame,
      evalHashes: Array[Long],
      textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val shingleHashes = transform(
      shinglesOfWords(split(lower(col(textCol)), " "), n), s => xxhash64(s))
    // coalesce: a NULL text propagates null through split → shingles →
    // arrays_overlap, and filter(!NULL) would DROP the row — while the batch
    // [[dropContaminated]] keeps null-text docs (they never flag in the
    // anti-join). Null-text rows have no shingles, so they are kept.
    docs.filter(coalesce(!arrays_overlap(shingleHashes, lit(evalHashes)), lit(true)))
  }

  /** [[maskContaminatedSpans]] as a STATELESS STREAMING gate — the
    * ingestion-time form ([[dropContaminatedStreaming]]'s pattern applied
    * to masking): the eval set ships as the driver-collected xxhash64
    * shingle array ([[evalShingleHashes]]) and each row masks its own
    * leaked spans entirely within the row — no per-doc aggregation, no
    * state, per-batch cost ∝ batch size like every streaming curation
    * gate here (the HOF chain is per-row over one document's words, not
    * a corpus-wide fan-out). Word i masks when ANY n-gram window
    * starting in [i−n+1, i] hits the eval set — the batch form's
    * coverage rule, modulo the 64-bit hash (a collision can only
    * over-mask, with ~n²/2⁻⁶⁴ probability). Unlike the batch REPORT
    * form, every row passes through (a stream cannot drop-and-report):
    * clean rows keep `textCol` verbatim with `n_masked_words = 0`, and
    * null text stays null with 0.
    */
  def maskContaminatedStreaming(
      docs: DataFrame,
      evalHashes: Array[Long],
      textCol: String,
      n: Int,
      maskToken: String = "<mask>"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(maskToken.nonEmpty && !maskToken.contains(" "),
      s"maskToken must be one space-free token, got '$maskToken'")
    require(!docs.columns.exists(Set("masked_text", "n_masked_words")),
      "masked_text/n_masked_words are reserved by maskContaminatedStreaming")
    val words = split(col(textCol), " ")
    val hitFlags = transform(
      shinglesOfWords(split(lower(col(textCol)), " "), n),
      s => array_contains(lit(evalHashes), xxhash64(s)))
    // word i is covered iff some flagged n-gram STARTS within n-1 words
    // before it; the window start range is non-empty whenever any shingle
    // exists (i - n + 1 <= numShingles - 1 for every word index). The
    // no-shingle case guards through CASE, not &&: a short doc's
    // sequence(0, -1) would otherwise build a DESCENDING range whose -1
    // feeds element_at(…, 0) — an ANSI-mode job failure
    val covered = (i: Column) =>
      when(size(hitFlags) > 0, exists(
        sequence(greatest(i - n + 1, lit(0)), least(i, size(hitFlags) - 1)),
        h => element_at(hitFlags, h + 1))).otherwise(lit(false))
    val idxs = sequence(lit(0), size(words) - 1)
    docs
      .withColumn("masked_text", array_join(
        zip_with(words, idxs,
          (w, i) => when(covered(i), lit(maskToken)).otherwise(w)), " "))
      .withColumn("n_masked_words",
        coalesce(size(filter(idxs, covered)).cast("long"), lit(0L)))
  }

  /** The eval shingle index persisted as a hash-bucketed managed table —
    * the [[dropContaminatedStreaming]] form for eval sets too large to ship
    * as a literal array: every micro-batch's stream-static anti join then
    * plans with ZERO exchange on the index side (the table's bucketing IS
    * the join partitioning), so per-batch cost stays ∝ batch size whatever
    * the eval set's size. Same layout recipe as the streaming near-dup
    * corpus index.
    */
  def writeBucketedEvalShingleIndex(
      evalDocs: DataFrame,
      tableName: String,
      textCol: String,
      n: Int,
      numBuckets: Int = 16): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val spark = evalDocs.sparkSession
    graft.Tables.dropManaged(spark, tableName)
    explodedShingles(evalDocs, textCol, n, keep = Nil)
      .select(col("__sh").as("shingle_hash")).distinct()
      .write.mode("overwrite")
      .bucketBy(numBuckets, "shingle_hash")
      .sortBy("shingle_hash")
      .saveAsTable(tableName)
    spark.table(tableName)
  }

  /** Drop docs sharing any n-gram with the bucketed eval index: explode the
    * input's shingle hashes, LEFT SEMI against the index to find
    * contaminated ids, LEFT ANTI back onto the input — the index side is
    * never reshuffled (its bucketing IS the join partitioning). A batch
    * operator; for streams run it per micro-batch inside `foreachBatch`
    * (the flag aggregates over a doc's shingles, which a continuous query
    * cannot do statelessly — the literal-array gate
    * [[dropContaminatedStreaming]] is the continuous form).
    */
  def dropContaminatedAgainstIndex(
      docs: DataFrame,
      evalIndex: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val docShingles = explodedShingles(docs, textCol, n, keep = Seq(col(idCol)))
      .select(col(idCol), col("__sh").as("shingle_hash"))
    val contaminated = docShingles
      .join(evalIndex, Seq("shingle_hash"), "left_semi")
      .select(col(idCol)).distinct()
    docs.join(contaminated, Seq(idCol), "left_anti")
  }
}
