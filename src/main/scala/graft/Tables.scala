package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Test-table catalog: registers the driver-generated parquet tables of one
  * scale-factor directory as temp views. Registration is memoized per
  * (session, dir) so repeated query invocations don't re-infer schemas.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Temp-view names are session-global, so memoize the LAST dir registered
  // per session and re-register whenever it changes — a (session, dir)-keyed
  // cache would silently leave views pointing at the previously registered
  // scale factor.
  private val registered = scala.collection.concurrent.TrieMap.empty[SparkSession, String]

  def register(spark: SparkSession, sfDir: String): Unit =
    if (!registered.get(spark).contains(sfDir)) synchronized {
      if (!registered.get(spark).contains(sfDir)) {
        // Older driver generations wrote events.ts as TIMESTAMP(NANOS),
        // which Spark has no native type for — keep nanosAsLong so those
        // files still load (as epoch-nanos long); newer generations write
        // timestamp[us] (TIMESTAMP_NTZ). Consumers go through eventTs /
        // eventTsMicros, which adapt to whichever the file carries.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        names.foreach { n =>
          spark.read.parquet(s"$sfDir/$n.parquet").createOrReplaceTempView(n)
        }
        registered.put(spark, sfDir)
      }
    }

  def df(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    register(spark, sfDir)
    spark.table(name)
  }

  /** Schema-adaptive event timestamp. The driver's events.parquet has
    * shipped `ts` both as TIMESTAMP(NANOS) — which Spark has no native type
    * for and reads as epoch-nanos long under `nanosAsLong` — and as
    * timestamp[us], which Spark reads as TIMESTAMP_NTZ. The engine adapts to
    * whatever the file carries, not vice versa (the reference's contract:
    * tests/preparable_context_parquet_test.rs:75-79 infers from the file).
    * Always returns a session-zoned TimestampType column; sessions run UTC,
    * so the wall clock equals the file's naive value either way.
    */
  def eventTs(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType         => timestamp_micros(expr("ts div 1000"))
    case TimestampNTZType => col("ts").cast(TimestampType)
    case _                => col("ts")
  }

  /** Event time as epoch micros (long) — the ordered-stage form used where
    * the query wants integer arithmetic rather than a timestamp (funnel).
    * Same schema adaptivity as [[eventTs]].
    */
  def eventTsMicros(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts div 1000")
    case _        => unix_micros(eventTs(df))
  }

  /** Bucketed copies of customer/orders on their join key, memoized per
    * (session, dir): both sides hash-bucketed into the same bucket count, so
    * a key join between them is co-located and plans with NO exchange — the
    * pre-partitioning strategy that at 100 TB turns the repeated fact⋈fact
    * join from a full shuffle into a local merge. Returns the (customer,
    * orders) table names.
    */
  private val bucketedFor = scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (String, String)]

  def bucketed(spark: SparkSession, sfDir: String): (String, String) =
    bucketedFor.getOrElseUpdate((spark, sfDir), {
      val suffix = math.abs(sfDir.hashCode).toString
      val (cName, oName) = (s"b_customer_$suffix", s"b_orders_$suffix")
      Seq(cName, oName).foreach(dropManaged(spark, _))
      df(spark, sfDir, "customer")
        .write.mode("overwrite").bucketBy(16, "c_custkey").sortBy("c_custkey")
        .saveAsTable(cName)
      df(spark, sfDir, "orders")
        .write.mode("overwrite").bucketBy(16, "o_custkey").sortBy("o_custkey")
        .saveAsTable(oName)
      (cName, oName)
    })

  /** Drop a managed table AND its warehouse directory: a previous JVM may
    * have left the managed location behind while this session's (in-memory)
    * catalog has no such table — `saveAsTable` would then fail on the
    * leftover files.
    */
  def dropManaged(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, name)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (loc.exists()) rm(loc)
  }
}
