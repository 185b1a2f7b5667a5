package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
        // events.parquet carries TIMESTAMP(NANOS) which Spark has no native
        // type for; read as epoch-nanos long (convert with timestamp_micros
        // where a timestamp is needed).
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
}
