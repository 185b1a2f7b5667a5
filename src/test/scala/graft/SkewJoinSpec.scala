package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** The salted join must (1) equal the plain join row-for-row, (2) actually
  * spread a hot key over multiple salt sub-keys, and (3) not replicate the
  * build side's cold keys.
  */
class SkewJoinSpec extends SparkTestBase {

  import spark.implicits._

  // 10,000 probe rows on key 1 (hot), 1 row each on keys 2..100 (cold)
  private lazy val probe = (Seq.fill(10000)(1L) ++ (2L to 100L)).zipWithIndex
    .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
  private lazy val build = (1L to 100L).map(k => (k, s"dim_$k")).toDF("k", "name")

  test("hotKeys finds exactly the skewed key") {
    SkewJoin.hotKeys(probe, "k", threshold = 1000L) shouldBe Seq(1L)
  }

  test("hotKeys caps at the maxKeys hottest regardless of threshold") {
    // threshold 0 admits every key; the cap keeps the result bounded and
    // ordered hottest-first
    val keys = SkewJoin.hotKeys(probe, "k", threshold = 0L, maxKeys = 5)
    keys should have size 5
    keys.head shouldBe 1L // the 10,000-row key ranks first
  }

  test("salted join equals the plain join") {
    val salted = SkewJoin.autoSaltedInnerJoin(probe, build, "k", threshold = 1000L, buckets = 8)
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = probe.join(build, Seq("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    salted shouldBe plain
  }

  test("the hot key spreads over multiple salts; cold keys are not replicated") {
    val salted = probe.withColumn("__graft_salt",
      when(col("k").isin(1L), SkewJoin.contentSalt(probe, 8)).otherwise(lit(0)))
    // the 10,000 hot rows land on all 8 sub-keys, so no reducer sees more
    // than ~1/8th of the hot key
    val saltsOfHot = salted.filter(col("k") === 1L)
      .select(countDistinct(col("__graft_salt"))).head().getLong(0)
    saltsOfHot shouldBe 8L
    val maxPerSalt = salted.filter(col("k") === 1L)
      .groupBy(col("__graft_salt")).count()
      .agg(max(col("count"))).head().getLong(0)
    maxPerSalt should be < 3000L

    // build side: hot key replicated 8x, cold keys exactly once
    val replicated = build.withColumn("__graft_salt",
      explode(when(col("k").isin(1L), lit((0 until 8).toArray)).otherwise(array(lit(0)))))
    replicated.filter(col("k") === 1L).count() shouldBe 8L
    replicated.filter(col("k") =!= 1L).count() shouldBe 99L
  }

  test("salt is a pure function of row content — stable under reordering") {
    // the stage-retry property: a fetch-failure recompute sees the same
    // rows in a DIFFERENT partition layout and order; the salt each row
    // derives must not change (monotonically_increasing_id would fail this)
    def saltMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Int] =
      df.withColumn("s", SkewJoin.contentSalt(df, 8))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val reordered = probe.repartition(7, col("v")).sortWithinPartitions(col("v").desc)
    saltMap(reordered) shouldBe saltMap(probe)
    // and it still spreads: the hot key's 10k distinct rows cover all 8 salts
    saltMap(probe).collect { case ((1L, _), s) => s }.toSet should have size 8
  }

  test("no hot keys degrades to the plain join") {
    val df = SkewJoin.autoSaltedInnerJoin(probe, build, "k", threshold = 100000L)
    df.columns should not contain "__graft_salt"
    df.count() shouldBe probe.count()
  }

  test("salted ≡ plain join over randomized skew shapes") {
    val rnd = new scala.util.Random(11)
    for (round <- 0 until 3) {
      // a zipf-ish probe: key k appears ~ N/k times, plus random noise keys
      val n = 50 + rnd.nextInt(50)
      val probeRows = (1 to n).flatMap(k =>
        Seq.fill(math.max(1, 2000 / (k * (1 + rnd.nextInt(3)))))((k.toLong, rnd.nextLong())))
      val p = probeRows.toDF("k", "v")
      val b = (1L to n.toLong).filter(_ => rnd.nextBoolean()).map(k => (k, s"d_$k")).toDF("k", "name")
      val threshold = 1L + rnd.nextInt(200)
      val buckets = 1 + rnd.nextInt(12)
      val maxKeys = 1 + rnd.nextInt(20)
      val salted = SkewJoin.autoSaltedInnerJoin(p, b, "k", threshold, buckets, maxKeys)
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val plain = p.join(b, Seq("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      withClue(s"round=$round threshold=$threshold buckets=$buckets maxKeys=$maxKeys: ") {
        salted shouldBe plain
      }
    }
  }
}
