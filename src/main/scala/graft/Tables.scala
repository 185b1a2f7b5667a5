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

  private val registered = scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Boolean]

  def register(spark: SparkSession, sfDir: String): Unit =
    registered.getOrElseUpdate((spark, sfDir), {
      // events.parquet carries TIMESTAMP(NANOS) which Spark has no native
      // type for; read as epoch-nanos long (convert with timestamp_micros
      // where a timestamp is needed).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      names.foreach { n =>
        spark.read.parquet(s"$sfDir/$n.parquet").createOrReplaceTempView(n)
      }
      true
    })

  def df(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    register(spark, sfDir)
    spark.table(name)
  }
}
