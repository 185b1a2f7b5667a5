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
  def read(spark: SparkSession, dir: String): DataFrame =
    parseLines(spark.read.text(s"$dir/*.cdxj"))

  /** The `urlkey ts {json}` line parse [[read]], [[readCompacted]] and
    * [[lookupPrefix]] share. A malformed line parses to an empty urlkey
    * and/or null fields (filterable), never an error — a damaged file
    * must not fail a 100k-file index scan.
    */
  private def parseLines(lines: DataFrame): DataFrame = {
    val jsonSchema = "url STRING, mime STRING, digest STRING, rid STRING, " +
      "offset STRING, length STRING, filename STRING"
    lines
      .select(
        regexp_extract(col("value"), "^(\\S+) (\\d{14}) (\\{.*)$", 1).as("urlkey"),
        regexp_extract(col("value"), "^(\\S+) (\\d{14}) (\\{.*)$", 2).as("timestamp"),
        from_json(
          regexp_extract(col("value"), "^(\\S+) (\\d{14}) (\\{.*)$", 3),
          jsonSchema, java.util.Collections.emptyMap[String, String]()).as("j"))
      .select(col("urlkey"), col("timestamp"),
        col("j.url").as("url"), col("j.mime").as("mime"),
        col("j.digest").as("digest"),
        // the record's own WARC-Record-ID — what a cross-archive revisit
        // referent must cite ([[WarcSink.markRevisits]])
        col("j.rid").as("rid"),
        col("j.offset").cast("long").as("offset"),
        col("j.length").cast("long").as("length"),
        col("j.filename").as("filename"))
  }

  /** COMPACT many per-archive `.cdxj` files into one GLOBALLY SURT-ORDERED
    * index under `outDir` — the zipnum/cluster layout Common Crawl serves
    * its petabyte URL index from: `nParts` range-partitioned,
    * internally-sorted line files, plus ONE small `cluster.idx` secondary
    * index (`firstKey TAB filename` per part, in range order) that
    * [[lookupPrefix]] prunes reads with.
    *
    * Cost shape: one range shuffle over index LINES (~1/1000 of the
    * archive bytes — compacting the index of a 100 TB crawl shuffles
    * ~100 GB), lexicographic line order ≡ (urlkey, timestamp) order
    * because the key is the line's prefix. The secondary index is bounded
    * by `nParts` (driver reads ONE line per part file), never by record
    * count.
    */
  def compact(spark: SparkSession, dir: String, outDir: String, nParts: Int = 16): Unit = {
    require(nParts >= 1, s"nParts must be >= 1, got $nParts")
    spark.read.text(s"$dir/*.cdxj")
      .repartitionByRange(nParts, col("value"))
      .sortWithinPartitions(col("value"))
      .write.mode("overwrite").text(outDir)
    val conf = spark.sessionState.newHadoopConf()
    val out = new org.apache.hadoop.fs.Path(outDir)
    val fs = out.getFileSystem(conf)
    val parts = fs.globStatus(new org.apache.hadoop.fs.Path(out, "part-*"))
      .sortBy(_.getPath.getName) // partition order = name order
    val entries = parts.flatMap { st =>
      if (st.getLen == 0) None // an empty range slice contributes no entry
      else {
        val in = fs.open(st.getPath)
        try {
          // first line only — bounded read regardless of file size. A
          // pathological first line longer than the 64 KiB window yields
          // a TRUNCATED first key, which can only WIDEN selectParts'
          // selection (a smaller lower bound), never lose a lookup hit.
          val buf = in.readNBytes(1 << 16)
          val nl = buf.indexOf('\n'.toByte)
          val line = new String(buf, 0, if (nl < 0) buf.length else nl,
            java.nio.charset.StandardCharsets.UTF_8)
          val key = line.takeWhile(_ != ' ')
          Some(s"$key\t${st.getPath.getName}")
        } finally in.close()
      }
    }
    val w = fs.create(new org.apache.hadoop.fs.Path(out, "cluster.idx"), true)
    try w.write((entries.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally w.close()
  }

  /** Every row of a compacted index (all parts, typed like [[read]]). */
  def readCompacted(spark: SparkSession, outDir: String): DataFrame =
    parseLines(spark.read.text(s"$outDir/part-*"))

  /** The `cluster.idx` entries of a compacted index, in range order:
    * (first urlkey of part, part filename). Driver-side — the file is
    * `nParts` lines.
    */
  private[graft] def clusterEntries(
      spark: SparkSession, outDir: String): Seq[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(outDir, "cluster.idx")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val text = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    text.split("\n").toIndexedSeq.filter(_.nonEmpty).map { l =>
      val tab = l.indexOf('\t')
      (l.substring(0, tab), l.substring(tab + 1))
    }
  }

  /** Which part files can hold keys with `prefix`: part i covers
    * [firstKey(i), firstKey(i+1)), so it intersects the prefix range
    * [prefix, prefix+U+FFFF) iff firstKey(i) sorts below the range's top
    * and the NEXT part's first key sorts above its bottom. Pure function
    * for the pruning spec.
    */
  private[graft] def selectParts(
      entries: Seq[(String, String)], prefix: String): Seq[String] = {
    val high = prefix + '\uffff'
    entries.zipWithIndex.collect {
      case ((firstKey, file), i)
        if firstKey <= high &&
          (i + 1 >= entries.length || entries(i + 1)._1 > prefix) => file
    }
  }

  /** PREFIX LOOKUP against a compacted index, reading ONLY the part
    * files whose key range intersects the prefix (via `cluster.idx`) —
    * the query shape the zipnum layout exists for: "every archived copy
    * under this SURT key / domain prefix" touches ~one part file of a
    * corpus-wide index, never the whole index. Returns [[read]]-typed
    * rows filtered to `urlkey` prefix matches.
    */
  def lookupPrefix(spark: SparkSession, outDir: String, prefix: String): DataFrame = {
    val picked = selectParts(clusterEntries(spark, outDir), prefix)
    if (picked.isEmpty) return parseLines(
      spark.read.text(s"$outDir/part-*")).limit(0)
    val paths = picked.map(f => s"$outDir/$f")
    parseLines(spark.read.text(paths: _*))
      .filter(col("urlkey").startsWith(prefix))
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
        // a downstream limit/take can abandon the iterator mid-partition —
        // the task-completion hook closes whatever is still open so a
        // bounded fetch never leaks one stream per task
        org.apache.spark.TaskContext.get() match {
          case null => ()
          case tc => tc.addTaskCompletionListener[Unit] { _ =>
            if (in != null) { in.close(); in = null }
          }
        }
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
          require(len >= 0 && len <= Int.MaxValue,
            s"cdx member length out of range for $f@$off: $len")
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
