package graft

import org.apache.spark.sql.SparkSession

/** Refcounted, per-(session, key) scoped conf override — the shared fix
  * for the save/restore race every naive `conf.set / finally restore`
  * block has (r17 advice on [[pipeline.Dedup.withAqeOff]], and the same
  * latent pattern in `prepare()`'s AQE suspension): two overlapping
  * windows on one session would let the inner `finally` restore the
  * OVERRIDDEN value it read inside the outer window, leaving the session
  * changed for good. Here only the OUTERMOST entry flips the conf (saving
  * the true prior state, including "unset") and only the LAST exit
  * restores it. Concurrent queries on the same session still observe the
  * override during the window — inherent to a shared conf; holders keep
  * the window to plan construction, never a job.
  */
private[graft] object ConfGuard {

  private final class Hold(val saved: Option[String], val value: String) { var depth: Int = 0 }
  private val holds =
    scala.collection.mutable.Map.empty[(SparkSession, String), Hold]

  def withSessionConf[T](sess: SparkSession, key: String, value: String)(body: => T): T = {
    holds.synchronized {
      val h = holds.getOrElseUpdate((sess, key), new Hold(sess.conf.getOption(key), value))
      // nested holds RIDE the outer window (only the outermost entry
      // flips the conf), so a nested request for a DIFFERENT value cannot
      // be honored — it would silently run under the outer value. Fail
      // loudly instead of lying (r18 advice).
      require(h.value == value,
        s"ConfGuard: nested withSessionConf($key) requested value '$value' inside an " +
          s"active hold of '${h.value}' — nested holds only compose with the SAME value")
      if (h.depth == 0) sess.conf.set(key, value)
      h.depth += 1
    }
    try body
    finally holds.synchronized {
      val h = holds((sess, key))
      h.depth -= 1
      if (h.depth == 0) {
        h.saved match {
          case Some(v) => sess.conf.set(key, v)
          case None => sess.conf.unset(key)
        }
        holds.remove((sess, key))
      }
    }
  }
}
