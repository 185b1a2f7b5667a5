package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** CDX(J) archive-index reader + random-access record fetch — the read
  * side of [[WarcSink]]'s companion index. The web-archive ecosystem
  * pairs every WARC with a SURT-ordered index (one line per record:
  * `urlkey timestamp {json}` with the record's compressed offset/length)
  * so a single page can be replayed WITHOUT scanning the archive —
  * Common Crawl's URL index is exactly this layout at the 100 TB scale.
  * Because the sink writes one gzip member per record, `(offset,
  * length)` slice one self-contained decodable member: a point read
  * touches `length` bytes of one file, never the archive.
  *
  * Scale shape: the index is ~200 B/record — 1/1000th of a typical
  * archive — so index scans are cheap by construction; [[fetch]]
  * partitions lookups by filename and sorts by offset inside each task,
  * so each archive opens once per task and reads advance monotonically
  * (sequential-friendly on object stores and disks alike). No driver
  * funnel: [[readRecordAt]] is the single-record (driver or executor)
  * primitive, [[fetch]] the distributed plan over any number of hits.
  */
object WarcCdx {

  /** Read every CDXJ index line under `dir` (`*.cdxj`, the
    * [[WarcSink]] naming) as typed columns: urlkey, timestamp, url,
    * mime, digest, offset, length, filename.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val jsonSchema = "url STRING, mime STRING, digest STRING, " +
      "offset STRING, length STRING, filename STRING"
    spark.read.text(s"$dir/*.cdxj")
      .select(
        regexp_extract(col("value"), "^(\\S+) (\\d{14}) (\\{.*)$", 1).as("urlkey"),
        regexp_extract(col("value"), "^(\\S+) (\\d{14}) (\\{.*)$", 2).as("timestamp"),
        from_json(
          regexp_extract(col("value"), "^(\\S+) (\\d{14}) (\\{.*)$", 3),
          jsonSchema, java.util.Collections.emptyMap[String, String]()).as("j"))
      .select(col("urlkey"), col("timestamp"),
        col("j.url").as("url"), col("j.mime").as("mime"),
        col("j.digest").as("digest"),
        col("j.offset").cast("long").as("offset"),
        col("j.length").cast("long").as("length"),
        col("j.filename").as("filename"))
  }

  /** Random-access one record: read exactly `length` bytes at `offset`
    * of `file` and parse the single member there (gzip-sniffed, the
    * [[Warc.parseRecords]] rules). None when the slice holds no whole
    * record (wrong coordinates, foreign file). This is the replay
    * primitive — `length` bytes of IO regardless of archive size.
    */
  def readRecordAt(
      conf: org.apache.hadoop.conf.Configuration,
      file: String,
      offset: Long,
      length: Long,
      maxRecordBytes: Int = 64 << 20): Option[Warc.WarcRecord] = {
    require(length <= Int.MaxValue, s"member length $length exceeds 2 GiB")
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      in.seek(offset)
      val buf = new Array[Byte](length.toInt)
      in.readFully(buf)
      Warc.parseRecords(file, buf, maxRecordBytes)
        .headOption.filter(_.warc_type != "graft:truncated")
    } finally in.close()
  }

  /** Convenience session form of [[readRecordAt]]. */
  def readRecordAt(
      spark: SparkSession, file: String, offset: Long, length: Long): Option[Warc.WarcRecord] =
    readRecordAt(spark.sessionState.newHadoopConf(), file, offset, length)

  /** Distributed point-read of many index hits: for each cdx row
    * (filename, offset, length — the [[read]] schema, any other columns
    * ignored), fetch its record. Lookups hash-partition by filename and
    * sort by offset within each task, so every archive opens ONCE per
    * task and its reads advance front-to-back; total IO is the sum of
    * member lengths, not of archive sizes. `dir` prefixes the index's
    * relative filenames.
    */
  def fetch(cdx: DataFrame, dir: String): Dataset[Warc.WarcRecord] = {
    val spark = cdx.sparkSession
    import spark.implicits._
    // hadoop conf props captured on the driver (Configuration is not
    // serializable) — the WarcSink executor-rebuild idiom
    val props = {
      val conf = spark.sessionState.newHadoopConf()
      val it = conf.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    cdx.select(col("filename"), col("offset"), col("length"))
      .repartition(col("filename"))
      .sortWithinPartitions(col("filename"), col("offset"))
      .as[(String, Long, Long)]
      .mapPartitions { rows =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        props.foreach { case (k, v) => conf.set(k, v) }
        var openFile: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        def ensure(f: String): org.apache.hadoop.fs.FSDataInputStream = {
          if (f != openFile) {
            if (in != null) in.close()
            val p = new org.apache.hadoop.fs.Path(dir, f)
            in = p.getFileSystem(conf).open(p)
            openFile = f
          }
          in
        }
        val it = rows.flatMap { case (f, off, len) =>
          val s = ensure(f)
          s.seek(off)
          val buf = new Array[Byte](len.toInt)
          s.readFully(buf)
          Warc.parseRecords(s"$dir/$f", buf, 64 << 20)
            .headOption.filter(_.warc_type != "graft:truncated")
        }
        // close the last open stream when the iterator drains
        new Iterator[Warc.WarcRecord] {
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h && in != null) { in.close(); in = null }
            h
          }
          def next(): Warc.WarcRecord = it.next()
        }
      }
  }
}
