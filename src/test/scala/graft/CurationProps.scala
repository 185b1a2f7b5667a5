package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

import graft.operators.{BloomPrune, ZOrder}
import graft.pipeline.{Mixture, QuantileFilter, Redaction, Similarity}

/** Property checks for the round-12 operators: invariants that must hold
  * for arbitrary inputs, not just the spec fixtures.
  */
object CurationProps extends Properties("Curation") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkTestBase.session

  private val genIds = Gen.nonEmptyListOf(Gen.choose(0L, 100000L)).map(_.distinct)
  private val genBits = Gen.choose(1, 20)

  property("zValue is injective on in-range pairs and round-trips both columns") =
    Prop.forAll(genBits, Gen.nonEmptyListOf(Gen.choose(0L, 1L << 20))) { (bits, raw) =>
      import spark.implicits._
      val mask = (1L << bits) - 1
      val pairs = raw.map(v => (v & mask, (v * 31 + 7) & mask)).distinct
      val zs = pairs.toDF("a", "b")
        .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b"), bits).as("z"))
        .as[(Long, Long, Long)].collect()
      def deinterleave(z: Long): (Long, Long) = {
        var (a, b, i) = (0L, 0L, 0)
        while (i < bits) {
          a |= ((z >> (2 * i)) & 1L) << i
          b |= ((z >> (2 * i + 1)) & 1L) << i
          i += 1
        }
        (a, b)
      }
      zs.forall { case (a, b, z) => deinterleave(z) == ((a, b)) } &&
        zs.map(_._3).distinct.length == pairs.length
    }

  property("bloom prefilter never loses a key that was built in") =
    Prop.forAll(genIds, genIds) { (dimIds, factIds) =>
      import spark.implicits._
      val dim = dimIds.toDF("k")
      val fact = (dimIds ++ factIds).distinct.toDF("k")
      val bytes = BloomPrune.buildFilterBytes(dim, "k", expectedItems = math.max(1, dimIds.length).toLong)
      val kept = BloomPrune.prefilter(fact, "k", bytes).as[Long].collect().toSet
      dimIds.toSet.subsetOf(kept)
    }

  property("l2Normalize yields unit norms for arbitrary non-zero vectors") =
    Prop.forAll(
      Gen.choose(1, 12),
      Gen.nonEmptyListOf(Gen.choose(-100, 100).map(_.toFloat / 7f))) { (dim, raw) =>
      import spark.implicits._
      val vecs = raw.zipWithIndex.map { case (seed, i) =>
        (i.toLong, Seq.tabulate(dim)(d => seed + d * 0.25f))
      }.filter(_._2.exists(_ != 0f))
      vecs.isEmpty || {
        val norms = Similarity.l2Normalize(vecs.toDF("vec_id", "embedding"))
          .selectExpr("sqrt(aggregate(unit, 0.0D, (a, x) -> a + x * x)) AS n")
          .as[Double].collect()
        norms.forall(n => math.abs(n - 1.0) < 1e-9)
      }
    }

  property("byQuantileBand ⊆ input; winsorize keeps every row inside the band") =
    Prop.forAll(genIds, Gen.choose(1, 3)) { (ids, nGroups) =>
      import spark.implicits._
      val df = ids.map(i => (i, s"g${i % nGroups}", i % 997)).toDF("doc_id", "grp", "v")
      val banded = QuantileFilter.byQuantileBand(df, "grp", "v", 0.2, 0.8)
        .select("doc_id").as[Long].collect().toSet
      val clamped = QuantileFilter.winsorize(df, "grp", "v", 0.2, 0.8)
      banded.subsetOf(ids.toSet) &&
        clamped.count() == ids.length && {
          // every clamped value sits inside its group's band
          val bounds = ids.groupBy(i => s"g${i % nGroups}").view.mapValues { g =>
            val vs = g.map(_ % 997).sorted.map(_.toDouble)
            def pct(p: Double) = {
              val r = p * (vs.length - 1)
              val lo = vs(r.toInt)
              val hi = vs(math.min(r.toInt + 1, vs.length - 1))
              lo + (r - r.toInt) * (hi - lo)
            }
            (pct(0.2), pct(0.8))
          }.toMap
          clamped.select("grp", "v").as[(String, Double)].collect().forall {
            case (g, v) =>
              val (lo, hi) = bounds(g)
              v >= lo - 1e-9 && v <= hi + 1e-9
          }
        }
    }

  property("redactPii is idempotent: masks never re-match as PII") =
    Prop.forAll(Gen.listOf(Gen.oneOf(
      Gen.oneOf("alpha", "beta", "12", "x.y", "a@b", "+1", "555", "10.0"),
      Gen.oneOf("bob@site.example.com", "555-123-4567", "(555) 123-4567",
        "+1 555-123-4567", "10.0.0.1", "u.v+w%x@a-b.cd")))) { words =>
      import spark.implicits._
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val once = Redaction.redactPii(df).select("text").as[String].head()
      val twice = Redaction.redactPii(Redaction.redactPii(df)).select("text").as[String].head()
      once == twice
    }

  property("resampleToMixture membership: subset, listed groups only, partition-invariant") =
    Prop.forAll(genIds, Gen.choose(2, 4)) { (ids, nGroups) =>
      import spark.implicits._
      // weight every group but the last: unlisted rows must vanish
      val weights = (0 until nGroups - 1).map(g => s"g$g" -> (g + 1).toDouble).toMap
      val df = ids.map(i => (i, s"g${i % nGroups}")).toDF("doc_id", "grp")
      val kept = Mixture.resampleToMixture(df, "grp", weights, "doc_id")
        .select("doc_id", "grp").as[(Long, String)].collect()
      val keptRepart = Mixture
        .resampleToMixture(df.repartition(5), "grp", weights, "doc_id")
        .select("doc_id", "grp").as[(Long, String)].collect()
      kept.map(_._1).toSet.subsetOf(ids.toSet) &&
        kept.forall { case (_, g) => weights.contains(g) } &&
        kept.sortBy(_._1).toSeq == keptRepart.sortBy(_._1).toSeq
    }
}
