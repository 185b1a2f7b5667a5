package graft

/** The refcounted scoped-conf guard behind [[pipeline.Dedup.withAqeOff]]
  * and `prepare()`'s AQE suspension: overlapping windows on one session
  * must restore the true prior state exactly once (r17 advice — a naive
  * save/restore pair lets an inner exit restore the override it read
  * inside the outer window, pinning the session).
  */
class ConfGuardSpec extends SparkTestBase {

  private val aqeKey = "spark.sql.adaptive.enabled"

  test("nested windows: inner exit does not restore, outer does") {
    val before = spark.conf.get(aqeKey)
    pipeline.Dedup.withAqeOff(spark) {
      spark.conf.get(aqeKey) shouldBe "false"
      pipeline.Dedup.withAqeOff(spark) {
        spark.conf.get(aqeKey) shouldBe "false"
      }
      // the inner exit must NOT have restored mid-window
      spark.conf.get(aqeKey) shouldBe "false"
    }
    spark.conf.get(aqeKey) shouldBe before
  }

  test("overlapping windows from two threads restore the pre-window value") {
    val before = spark.conf.get(aqeKey)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() =>
      pipeline.Dedup.withAqeOff(spark) {
        entered.countDown()
        release.await()
      })
    t.start()
    entered.await()
    // the main thread's whole window opens and closes INSIDE the other
    // thread's window — its exit must not restore anything yet
    pipeline.Dedup.withAqeOff(spark) {
      spark.conf.get(aqeKey) shouldBe "false"
    }
    spark.conf.get(aqeKey) shouldBe "false" // the thread still holds it
    release.countDown()
    t.join()
    spark.conf.get(aqeKey) shouldBe before
  }

  test("an unset key restores to unset, and exceptions still release the hold") {
    val scratch = "spark.graft.test.confguard"
    spark.conf.getOption(scratch) shouldBe None
    an[RuntimeException] should be thrownBy
      ConfGuard.withSessionConf(spark, scratch, "on") {
        spark.conf.get(scratch) shouldBe "on"
        throw new RuntimeException("boom")
      }
    spark.conf.getOption(scratch) shouldBe None // unset again, hold released
    // and the guard is reusable after the exception
    ConfGuard.withSessionConf(spark, scratch, "again") {
      spark.conf.get(scratch) shouldBe "again"
    }
    spark.conf.getOption(scratch) shouldBe None
  }

  test("a nested hold requesting a DIFFERENT value fails loudly, not silently") {
    // nested holds ride the outer window (only the outermost entry flips
    // the conf) — honoring a different inner value is impossible, and
    // r18's contract was to run under the OUTER value without any signal.
    // Now: same value composes, different value throws, and the outer
    // window survives the rejection intact.
    val scratch = "spark.graft.test.confguard.nested"
    ConfGuard.withSessionConf(spark, scratch, "outer") {
      ConfGuard.withSessionConf(spark, scratch, "outer") {
        spark.conf.get(scratch) shouldBe "outer" // same value: composes
      }
      val e = the[IllegalArgumentException] thrownBy
        ConfGuard.withSessionConf(spark, scratch, "inner") { fail("must not run") }
      e.getMessage should include("nested")
      spark.conf.get(scratch) shouldBe "outer" // outer hold undisturbed
    }
    spark.conf.getOption(scratch) shouldBe None
  }
}
