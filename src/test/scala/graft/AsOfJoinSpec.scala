package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, SkewJoin}

class AsOfJoinSpec extends SparkTestBase {

  import spark.implicits._

  test("each left row gets the greatest right ts <= its ts, per key") {
    val quotes = Seq( // (key, ts, price)
      (1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0),
      (2L, 15L, 9.0)
    ).toDF("k", "qts", "price")
    val trades = Seq( // (key, ts, qty)
      (1L, 5L, 100L),  // before any quote -> null
      (1L, 20L, 200L), // equal ts -> sees the 20L quote (<= semantics)
      (1L, 25L, 300L), // between -> 20L quote
      (1L, 99L, 400L), // after all -> 30L quote
      (2L, 16L, 500L), // other key -> its own quote
      (3L, 50L, 600L)  // key with no quotes -> null
    ).toDF("k", "ts", "qty")

    val got = AsOfJoin.asofJoinBackward(trades, quotes, "k", "ts", "qts")
      .select(col("k"), col("ts"), col("qty"), col("asof_price"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet

    got shouldBe Set(
      (1L, 5L, 100L, None),
      (1L, 20L, 200L, Some(2.0)),
      (1L, 25L, 300L, Some(2.0)),
      (1L, 99L, 400L, Some(3.0)),
      (2L, 16L, 500L, Some(9.0)),
      (3L, 50L, 600L, None))
  }

  test("forward: each left row gets the smallest right ts >= its ts, per key") {
    val quotes = Seq(
      (1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0),
      (2L, 15L, 9.0)
    ).toDF("k", "qts", "price")
    val trades = Seq(
      (1L, 5L, 100L),  // before any quote -> the 10L quote
      (1L, 20L, 200L), // equal ts -> sees the 20L quote (>= semantics)
      (1L, 25L, 300L), // between -> 30L quote
      (1L, 99L, 400L), // after all -> null
      (2L, 14L, 500L), // other key -> its own quote
      (3L, 50L, 600L)  // key with no quotes -> null
    ).toDF("k", "ts", "qty")

    val got = AsOfJoin.asofJoinForward(trades, quotes, "k", "ts", "qts")
      .select(col("k"), col("ts"), col("qty"), col("asof_price"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet

    got shouldBe Set(
      (1L, 5L, 100L, Some(1.0)),
      (1L, 20L, 200L, Some(2.0)),
      (1L, 25L, 300L, Some(3.0)),
      (1L, 99L, 400L, None),
      (2L, 14L, 500L, Some(9.0)),
      (3L, 50L, 600L, None))
  }

  test("forward matches a naive per-row computation on random data") {
    val rnd = new scala.util.Random(7)
    val lefts = Seq.fill(300)((rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, rnd.nextLong()))
    val rights = Seq.fill(200)((rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val l = lefts.toDF("k", "ts", "v")
    val r = rights.toDF("k", "rts", "price")

    val got = AsOfJoin.asofJoinForward(l, r, "k", "ts", "rts")
      .select(col("k"), col("ts"), col("v"), col("asof_price"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toSet

    val expected = lefts.map { case (k, ts, v) =>
      val m = rights.filter(q => q._1 == k && q._2 >= ts).sortBy(_._2).headOption.map(_._3)
      (k, ts, v, m)
    }.toSet
    got shouldBe expected
  }

  test("matches a naive per-row computation on random data") {
    val rnd = new scala.util.Random(3)
    val lefts = Seq.fill(300)((rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, rnd.nextLong()))
    val rights = Seq.fill(200)((rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, rnd.nextDouble()))
      // unique (key, ts) on the right — ties would make "the" match ambiguous
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val l = lefts.toDF("k", "ts", "v")
    val r = rights.toDF("k", "rts", "price")

    val got = AsOfJoin.asofJoinBackward(l, r, "k", "ts", "rts")
      .select(col("k"), col("ts"), col("v"), col("asof_price"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toSet

    val expected = lefts.map { case (k, ts, v) =>
      val m = rights.filter(q => q._1 == k && q._2 <= ts).sortBy(_._2).lastOption.map(_._3)
      (k, ts, v, m)
    }.toSet
    got shouldBe expected
  }

  /** Partition-occupancy assertions need AQE's small-partition coalescing
    * off: on test-sized data it merges every reducer into one, hiding the
    * very distribution being asserted (at scale the partitions are far
    * beyond the advisory size and never coalesce).
    */
  private def withoutCoalescing[A](body: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("skew: a pathological hot key serializes onto one task but stays correct") { withoutCoalescing {
    // The operator windows by key alone, so one dominant key (a stuck
    // symbol, a default tenant) flows through a SINGLE task — wall-clock
    // degrades to that task but results must not. 50k left + 5k right rows
    // on the hot key, an analytic oracle (greatest multiple of 10 <= ts),
    // and an executable assertion of the caveat itself.
    val hotLeft = spark.range(0, 50000)
      .select(lit(1L).as("k"), col("id").as("ts"), col("id").as("v"))
    val hotRight = spark.range(0, 5000)
      .select(lit(1L).as("k"), (col("id") * 10).as("rts"), (col("id") * 10).cast("double").as("price"))
    val coldLeft = spark.range(0, 100)
      .select((col("id") % 5 + 2).as("k"), col("id").as("ts"), col("id").as("v"))
    val coldRight = spark.range(0, 50)
      .select((col("id") % 5 + 2).as("k"), col("id").as("rts"), col("id").cast("double").as("price"))

    val out = AsOfJoin.asofJoinBackward(
      hotLeft.union(coldLeft), hotRight.union(coldRight), "k", "ts", "rts")
    out.count() shouldBe 50100L
    val hotMismatches = out.filter(col("k") === 1)
      .filter(col("asof_price") =!= floor(col("ts") / 10) * 10)
      .count()
    hotMismatches shouldBe 0L
    // the caveat, made executable: every hot-key row lands in ONE window
    // partition (salting would need a two-level carry-forward; doc'd trade).
    // asof_price must stay in the projection — selecting pid alone lets
    // Catalyst prune the whole Window and report the pre-shuffle splits.
    val hotPartitions = out.filter(col("k") === 1)
      .select(spark_partition_id().as("pid"), col("asof_price"))
      .collect().map(_.getInt(0)).distinct.length
    hotPartitions shouldBe 1
  } }

  test("salted variant spreads the hot key over several tasks, result-equal") { withoutCoalescing {
    val hotLeft = spark.range(0, 20000)
      .select(lit(1L).as("k"), col("id").as("ts"), col("id").as("v"))
    val hotRight = spark.range(0, 2000)
      .select(lit(1L).as("k"), (col("id") * 10).as("rts"), (col("id") * 10).cast("double").as("price"))
    val coldLeft = spark.range(0, 100)
      .select((col("id") % 5 + 2).as("k"), col("id").as("ts"), col("id").as("v"))
    val coldRight = spark.range(0, 50)
      .select((col("id") % 5 + 2).as("k"), col("id").as("rts"), col("id").cast("double").as("price"))
    val l = hotLeft.union(coldLeft); val r = hotRight.union(coldRight)

    // hot-key detection via the shared SkewJoin contract
    val hot = SkewJoin.hotKeys(l, "k", threshold = 1000L)
    hot shouldBe Seq(1L)

    val salted = AsOfJoin.asofJoinBackwardSalted(l, r, "k", "ts", "rts", hot, buckets = 8)
    val plain = AsOfJoin.asofJoinBackward(l, r, "k", "ts", "rts")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"), col("ts"), col("v"), col("asof_price"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toSet
    rows(salted) shouldBe rows(plain)

    // the point of salting: the hot key now runs on MULTIPLE window tasks
    // (asof_price kept in the projection so the Window isn't pruned away)
    val hotPartitions = salted.filter(col("k") === 1)
      .select(spark_partition_id().as("pid"), col("asof_price"))
      .collect().map(_.getInt(0)).distinct.length
    hotPartitions should be > 1
    // cold keys never replicate: each cold left row appears exactly once
    salted.filter(col("k") =!= 1).count() shouldBe 100L
  } }

  test("salted variant matches a naive per-row computation on random data") {
    val rnd = new scala.util.Random(11)
    val lefts = Seq.fill(400)(((rnd.nextInt(4) + 1).toLong, rnd.nextInt(1000).toLong, rnd.nextLong()))
    val rights = Seq.fill(150)(((rnd.nextInt(4) + 1).toLong, rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val l = lefts.toDF("k", "ts", "v")
    val r = rights.toDF("k", "rts", "price")

    // salt EVERY key (all 4 are "hot") — the hardest case for equivalence
    val got = AsOfJoin.asofJoinBackwardSalted(l, r, "k", "ts", "rts",
        hot = Seq(1L, 2L, 3L, 4L), buckets = 5)
      .select(col("k"), col("ts"), col("v"), col("asof_price"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toSet

    val expected = lefts.map { case (k, ts, v) =>
      val m = rights.filter(q => q._1 == k && q._2 <= ts).sortBy(_._2).lastOption.map(_._3)
      (k, ts, v, m)
    }.toSet
    got shouldBe expected
  }

  test("plans as one shuffle + window, no join operator") {
    val l = Seq((1L, 10L, 1L)).toDF("k", "ts", "v")
    val r = Seq((1L, 5L, 2.0)).toDF("k", "rts", "p")
    val plan = AsOfJoin.asofJoinBackward(l, r, "k", "ts", "rts")
      .queryExecution.executedPlan.toString
    plan should include("Window")
    plan should not include "Join"
  }
  test("the match is ONE right row: its nulls stay null, columns never mix rows") {
    // per-column last(ignoreNulls) used to resurrect an OLDER row's value
    // under a genuine null in the matched row — and could stitch the
    // matched columns from DIFFERENT right rows. DuckDB/pandas ASOF attach
    // the single nearest row wholesale; pin that.
    val quotes = Seq[(Long, Long, Option[Double], Option[String])](
      (1L, 10L, Some(1.0), Some("a")),
      (1L, 20L, None, Some("b")),      // nearest for ts >= 20: null price
      (1L, 30L, Some(3.0), None)       // nearest for ts >= 30: null venue
    ).toDF("k", "qts", "price", "venue")
    val trades = Seq((1L, 25L, 100L), (1L, 35L, 200L)).toDF("k", "ts", "qty")
    val got = AsOfJoin.asofJoinBackward(trades, quotes, "k", "ts", "qts")
      .select(col("ts"), col("asof_price"), col("asof_venue"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2)))).toSet
    got shouldBe Set(
      (25L, None, Some("b")),     // the 20L row verbatim — NOT (1.0, "b")
      (35L, Some(3.0), None))     // the 30L row verbatim — NOT (3.0, "b")
    // forward mirror: nearest later row's nulls also stay null
    val fwd = AsOfJoin.asofJoinForward(trades, quotes, "k", "ts", "qts")
      .filter(col("ts") === 25L).select("asof_price", "asof_venue").collect().head
    fwd.isNullAt(1) shouldBe true // the 30L row's venue
    fwd.getDouble(0) shouldBe 3.0
  }
  test("randomized differential: asof ≡ brute-force reference, nulls and salting included") {
    // seeded sweep over random (key, ts) layouts with nullable value
    // columns — the class the null-carry fix covers, pinned broadly.
    // Right (key, ts) pairs are unique: among equal-ts right rows the
    // pick is unordered by every ASOF implementation, so a differential
    // test must not manufacture that ambiguity.
    val rnd = new scala.util.Random(0xA50F)
    (0 until 3).foreach { round =>
      val right = (0 until 40).map { _ =>
        (rnd.nextInt(4).toLong, rnd.nextInt(30).toLong,
          if (rnd.nextBoolean()) Some(rnd.nextInt(100).toDouble) else None,
          if (rnd.nextInt(4) == 0) None else Some("v" + rnd.nextInt(10)))
      }.distinctBy(r => (r._1, r._2))
      val left = (0 until 60).map(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(32).toLong, i.toLong))
      val rdf = right.toDF("k", "rts", "price", "venue")
      val ldf = left.toDF("k", "ts", "row_id")
      def reference(forward: Boolean) = left.map { case (k, ts, id) =>
        val cand = right.filter(r =>
          r._1 == k && (if (forward) r._2 >= ts else r._2 <= ts))
        val m = if (cand.isEmpty) None
          else Some(if (forward) cand.minBy(_._2) else cand.maxBy(_._2))
        (id, m.flatMap(_._3), m.flatMap(_._4))
      }.toSet
      def got(df: org.apache.spark.sql.DataFrame) =
        df.select("row_id", "asof_price", "asof_venue").collect()
          .map(r => (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getDouble(1)),
            if (r.isNullAt(2)) None else Some(r.getString(2)))).toSet
      withClue(s"round $round (seeded — replays exactly): ") {
        got(AsOfJoin.asofJoinBackward(ldf, rdf, "k", "ts", "rts")) shouldBe reference(false)
        got(AsOfJoin.asofJoinForward(ldf, rdf, "k", "ts", "rts")) shouldBe reference(true)
        got(AsOfJoin.asofJoinBackwardSalted(ldf, rdf, "k", "ts", "rts",
          hot = Seq(0L, 1L), buckets = 4)) shouldBe reference(false)
        got(AsOfJoin.asofJoinForwardSalted(ldf, rdf, "k", "ts", "rts",
          hot = Seq(2L), buckets = 3)) shouldBe reference(true)
      }
    }
  }
}
