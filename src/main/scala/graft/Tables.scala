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
