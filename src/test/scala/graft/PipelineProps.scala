package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Packing, Sampling}

/** Property checks for the deterministic corpus operators: the invariants
  * that make them safe to re-run at 100 TB (pure functions of content,
  * exact per-group cardinalities, tiling offsets) must hold for ARBITRARY
  * id sets and parameters, not just the spec fixtures.
  */
object PipelineProps extends Properties("Pipeline") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkTestBase.session

  private val genIds = Gen.nonEmptyListOf(Gen.choose(0L, 100000L)).map(_.distinct)
  private val genK = Gen.choose(1, 40)
  private val genSeqLen = Gen.oneOf(64, 257, 1024)
  private val genShards = Gen.choose(1, 8)

  property("connectedComponents: driver tier ≡ distributed loop on arbitrary graphs") =
    Prop.forAll(Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 40L))).map(_.take(50))) { edges =>
      import spark.implicits._
      // self-pairs, duplicates, multi-component shapes — whatever the
      // generator produces, the small-graph driver finish (default at this
      // size) and the distributed loop must emit identical labels
      val df = edges.toDF("id_a", "id_b")
      val fast = Dedup.connectedComponents(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val slow = Dedup.connectedComponents(df, driverFinishEdges = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      Dedup.clearCheckpoints()
      fast == slow
    }

  property("quotaPerGroup returns exactly min(k, |group|) rows, a subset of the input") =
    Prop.forAll(genIds, genK) { (ids, k) =>
      import spark.implicits._
      val df = ids.map(i => (i, (i % 3).toString)).toDF("doc_id", "g")
      val got = Sampling.quotaPerGroup(df, "doc_id", "g", k)
        .as[(Long, String)].collect()
      val bySize = got.groupBy(_._2).view.mapValues(_.length).toMap
      val want = ids.groupBy(i => (i % 3).toString).view.mapValues(v => math.min(k, v.length)).toMap
      bySize == want && got.map(_._1).toSet.subsetOf(ids.toSet)
    }

  property("packSequences offsets tile every shard with pack = offset div seqLen") =
    Prop.forAll(genIds, genSeqLen, genShards) { (ids, seqLen, shards) =>
      import spark.implicits._
      val df = ids.map(i => (i, i % 97 + 1)).toDF("doc_id", "n_tok")
      val rows = Packing.packSequences(df, "doc_id", "n_tok", seqLen, shards)
        .select("shard", "start_offset", "n_tok", "pack")
        .as[(Long, Long, Long, Long)].collect()
      rows.length == ids.length &&
        rows.forall { case (_, off, _, pack) => pack == off / seqLen } &&
        rows.groupBy(_._1).values.forall { g =>
          val sorted = g.sortBy(_._2)
          sorted.head._2 == 0L &&
            sorted.sliding(2).forall {
              case Array((_, s1, t1, _), (_, s2, _, _)) => s2 == s1 + t1
              case _ => true
            }
        }
    }

  property("chunkDocuments reproduces every window of the token stream exactly") =
    Prop.forAll(Gen.choose(1, 120), Gen.choose(2, 20), Gen.choose(0, 19)) { (len, chunk, ovRaw) =>
      val ov = ovRaw % chunk // keep 0 <= overlap < chunkTokens
      import spark.implicits._
      val tokens = (0 until len).map(i => s"t$i")
      val df = Seq((1L, tokens.mkString(" "))).toDF("doc_id", "text")
      val stride = chunk - ov
      val got = Packing.chunkDocuments(df, chunk, ov)
        .select("chunk_idx", "chunk_text")
        .as[(Int, String)].collect().sortBy(_._1)
      val wantCount = (len + stride - 1) / stride
      got.length == wantCount &&
        got.zipWithIndex.forall { case ((idx, text), i) =>
          idx == i && text == tokens.slice(i * stride, i * stride + chunk).mkString(" ")
        }
    }

  property("bigramStats equals a naive replay for arbitrary token streams") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d")))) { docsTokens =>
      import spark.implicits._
      val df = docsTokens.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.pipeline.TextAnalysis.bigramStats(df, k = 100)
        .as[(String, Long, Double)].collect().toSeq
      // naive replay
      val uni = docsTokens.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val total = docsTokens.map(_.length).sum.toLong
      val bg = docsTokens.flatMap(ts => ts.zip(ts.drop(1)))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val want = bg.toSeq
        .map { case ((a, b), c) =>
          (s"$a $b", c, total.toDouble * c.toDouble / (uni(a) * uni(b)).toDouble)
        }
        .sortBy { case (s, c, _) => (-c, s) }
        .take(100)
      got == want
    }

  property("oovStats equals a naive set replay") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.oneOf("x", "y", "z", "w", "v"))),
      Gen.someOf("x", "y", "z")) { (docsTokens, vocab) =>
      import spark.implicits._
      val df = docsTokens.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val vdf = vocab.toSeq.toDF("term")
      val got = graft.pipeline.TextAnalysis.oovStats(df, vdf)
        .select("doc_id", "n_tokens", "n_oov")
        .as[(Long, Long, Long)].collect().toSet
      val vset = vocab.toSet
      val want = docsTokens.zipWithIndex.map { case (ts, i) =>
        (i.toLong, ts.length.toLong, ts.count(t => !vset(t)).toLong)
      }.toSet
      got == want
    }

  property("stratifiedSample membership is independent of row order and partitioning") =
    Prop.forAll(genIds, Gen.choose(1, 7)) { (ids, parts) =>
      import spark.implicits._
      val a = ids.map(i => (i, (i % 2).toString)).toDF("doc_id", "g")
      val b = scala.util.Random.shuffle(ids).map(i => (i, (i % 2).toString))
        .toDF("doc_id", "g").repartition(parts)
      def sample(df: org.apache.spark.sql.DataFrame) =
        Sampling.stratifiedSample(df, "doc_id", "g", Map("0" -> 0.5), default = 0.25)
          .select("doc_id").as[Long].collect().toSet
      sample(a) == sample(b)
    }
}
