package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{BinaryType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Distributed WARC ARCHIVE SINK — the write side of [[Warc]]: a crawler's
  * fetch stage lands (uri, payload) rows and must persist them in the
  * container format the ecosystem exchanges (ISO 28500, one gzip member
  * per record — the Common Crawl layout [[Warc.read]] consumes). A DSv2
  * batch write: each input partition streams its rows into ONE
  * `.warc(.gz)` file — the same one-file-per-task distribution unit the
  * reader uses, so write parallelism is the frame's partitioning and no
  * driver funnel exists at any corpus size. Task attempts write to a
  * job-scoped temp directory and the files move into place only in the
  * driver-side job commit (speculative/retried attempts are discarded by
  * Spark's commit coordination + our rename-on-commit), so readers never
  * observe a half-written archive.
  *
  * Input schema: `target_uri STRING` + `payload BINARY` (the record
  * block — for response records, HTTP status line + headers + body),
  * optional `warc_date STRING` and `content_type STRING`. Records write
  * as `WARC-Type: response` with `Content-Length` framing byte-exact to
  * [[Warc.render]], so read-back parity is spec- and oracle-checked.
  * Header values are CR/LF-sanitized — a hostile URI cannot inject
  * header lines or break record framing.
  *
  * `SaveMode.Overwrite` (via `SupportsTruncate`) removes previous
  * `part-*` archives in the commit that installs the new ones; `Append`
  * adds files under a fresh query id (names never collide).
  */
object WarcSink {

  /** Write `df` as WARC files under `path`, one file per partition. */
  def write(
      df: DataFrame,
      path: String,
      gzipMembers: Boolean = true,
      overwrite: Boolean = true): Unit =
    df.write.format(classOf[WarcSinkSource].getName)
      .option("gzip", gzipMembers.toString)
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.Append)
      .save(path)

  private[sources] def validate(schema: StructType): (Int, Int, Int, Int) = {
    def idxOf(name: String, tpe: org.apache.spark.sql.types.DataType): Int = {
      val i = schema.fieldNames.indexOf(name)
      require(i < 0 || schema(i).dataType == tpe,
        s"WarcSink column '$name' must be $tpe, got ${schema(i).dataType}")
      i
    }
    val uri = idxOf("target_uri", StringType)
    val payload = idxOf("payload", BinaryType)
    require(uri >= 0 && payload >= 0,
      s"WarcSink needs 'target_uri' STRING and 'payload' BINARY columns, " +
        s"got [${schema.fieldNames.mkString(", ")}]")
    (uri, payload, idxOf("warc_date", StringType), idxOf("content_type", StringType))
  }

  /** Header values are single-line by format: CR/LF (header injection /
    * framing break) are replaced with spaces.
    */
  private[sources] def sanitize(v: String): String =
    if (v.indexOf('\r') < 0 && v.indexOf('\n') < 0) v
    else v.replace('\r', ' ').replace('\n', ' ')
}

class WarcSinkSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType().add("target_uri", StringType).add("payload", BinaryType)
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcSinkTable(schema, properties.get("path"),
      !"false".equalsIgnoreCase(properties.getOrDefault("gzip", "true")))
}

class WarcSinkTable(writeSchema: StructType, path: String, gzip: Boolean)
    extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "WarcSink needs a path")
  override def name(): String = s"warc-sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    WarcSink.validate(info.schema())
    new WarcWriteBuilder(info.schema(), path, gzip, info.queryId())
  }
}

class WarcWriteBuilder(schema: StructType, path: String, gzip: Boolean, queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = {
    // hadoop conf props captured on the driver (Configuration itself is
    // not serializable); executors rebuild from the list
    val props = {
      val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
      val it = conf.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    val doTruncate = truncateFirst
    new Write {
      override def toBatch: BatchWrite =
        new WarcBatchWrite(schema, path, gzip, queryId, doTruncate, props)
    }
  }
}

case class WarcCommit(partitionId: Int, tempPath: String) extends WriterCommitMessage

class WarcBatchWrite(
    schema: StructType, path: String, gzip: Boolean, queryId: String,
    truncateFirst: Boolean, hadoopProps: Array[(String, String)]) extends BatchWrite {

  private def conf: Configuration = {
    val c = new Configuration(false)
    hadoopProps.foreach { case (k, v) => c.set(k, v) }
    c
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    WarcWriterFactory(schema, path, gzip, queryId, hadoopProps)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = FileSystem.get(dir.toUri, conf)
    fs.mkdirs(dir)
    def renameOrThrow(src: Path, dest: Path): Unit =
      // Hadoop rename reports many failures by RETURNING false — a
      // dropped file must fail the job, not silently truncate the archive
      if (!fs.rename(src, dest))
        throw new java.io.IOException(s"WarcSink commit: rename $src -> $dest failed")
    // Overwrite moves the previous archive ASIDE first (underscore dir —
    // hidden from readers), never delete-then-install: a failure at any
    // point leaves either the old archive recoverable in the aside dir or
    // the new one fully installed, and a concurrent reader never sees an
    // old/new mix
    val aside = new Path(dir, s"_graft_warc_old_$queryId")
    if (truncateFirst) {
      val old = fs.globStatus(new Path(dir, "part-*"))
      if (old != null && old.nonEmpty) {
        fs.mkdirs(aside)
        old.foreach(st => renameOrThrow(st.getPath, new Path(aside, st.getPath.getName)))
      }
    }
    val ext = if (gzip) ".warc.gz" else ".warc"
    // empty partitions commit no file (lazy creation) — nothing to move
    messages.collect { case m: WarcCommit if m.tempPath.nonEmpty => m }.foreach { m =>
      renameOrThrow(new Path(m.tempPath), new Path(dir, f"part-$queryId-${m.partitionId}%05d$ext"))
    }
    fs.delete(aside, true)
    fs.delete(WarcWriterFactory.tempDir(path, queryId), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // Spark calls this when commit() throws mid-way: roll back precisely —
    // new files carry this query's id in their names, so any partial
    // install deletes cleanly, and an overwrite's moved-aside old archive
    // restores to where readers expect it (no stranded hidden copy, no
    // committed-looking partial archive)
    val dir = new Path(path)
    val fs = FileSystem.get(dir.toUri, conf)
    val mine = fs.globStatus(new Path(dir, s"part-$queryId-*"))
    if (mine != null) mine.foreach(st => fs.delete(st.getPath, false))
    val aside = new Path(dir, s"_graft_warc_old_$queryId")
    if (fs.exists(aside)) {
      val old = fs.globStatus(new Path(aside, "*"))
      if (old != null)
        old.foreach(st => fs.rename(st.getPath, new Path(dir, st.getPath.getName)))
      fs.delete(aside, true)
    }
    fs.delete(WarcWriterFactory.tempDir(path, queryId), true)
  }
}

object WarcWriterFactory {
  private[sources] def tempDir(path: String, queryId: String): Path =
    new Path(path, s"_graft_warc_tmp_$queryId")
}

case class WarcWriterFactory(
    schema: StructType, path: String, gzip: Boolean, queryId: String,
    hadoopProps: Array[(String, String)]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(schema, path, gzip, queryId, partitionId, taskId, hadoopProps)
}

object WarcDataWriter {
  /** Close-shield: lets a per-record GZIPOutputStream be close()d — which
    * ends its native Deflater — without closing the underlying archive
    * stream. Bulk writes delegate (FilterOutputStream's default is
    * byte-at-a-time).
    */
  private[sources] final class NoClose(out: java.io.OutputStream)
      extends java.io.FilterOutputStream(out) {
    override def write(b: Array[Byte], off: Int, len: Int): Unit = out.write(b, off, len)
    override def close(): Unit = flush()
  }
}

/** One task's writer: streams records into one temp WARC file (created
  * lazily — an empty partition contributes no file), each record its own
  * gzip member when `gzip`.
  */
class WarcDataWriter(
    schema: StructType, path: String, gzip: Boolean, queryId: String,
    partitionId: Int, taskId: Long, hadoopProps: Array[(String, String)])
    extends DataWriter[InternalRow] {

  private val (uriIdx, payloadIdx, dateIdx, ctypeIdx) = WarcSink.validate(schema)
  private var out: org.apache.hadoop.fs.FSDataOutputStream = _
  private var tempPath: Path = _

  private def ensureOpen(): Unit = if (out == null) {
    val c = new Configuration(false)
    hadoopProps.foreach { case (k, v) => c.set(k, v) }
    tempPath = new Path(WarcWriterFactory.tempDir(path, queryId), s"t-$partitionId-$taskId")
    val fs = FileSystem.get(tempPath.toUri, c)
    out = fs.create(tempPath, true)
  }

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    def str(i: Int, default: String): String =
      if (i < 0 || row.isNullAt(i)) default else WarcSink.sanitize(row.getUTF8String(i).toString)
    val payload = if (row.isNullAt(payloadIdx)) Array.empty[Byte] else row.getBinary(payloadIdx)
    val header =
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: ${str(uriIdx, "")}\r\n" +
        s"WARC-Date: ${str(dateIdx, "")}\r\n" +
        s"Content-Type: ${str(ctypeIdx, "application/http; msgtype=response")}\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n"
    val rec = new java.io.ByteArrayOutputStream(header.length + payload.length + 4)
    rec.write(header.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    rec.write(payload)
    rec.write("\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    if (gzip) {
      // one gzip member per record (the Common Crawl layout Warc.read
      // sniffs and streams through), written through a close-shield so
      // gz.close() can END the member's native Deflater without closing
      // the archive file — finish() alone would leak one off-heap zlib
      // context per record until GC notices
      val gz = new java.util.zip.GZIPOutputStream(new WarcDataWriter.NoClose(out))
      gz.write(rec.toByteArray)
      gz.close()
    } else out.write(rec.toByteArray)
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    WarcCommit(partitionId, if (tempPath == null) "" else tempPath.toString)
  }

  override def abort(): Unit = if (out != null) {
    out.close()
    val c = new Configuration(false)
    hadoopProps.foreach { case (k, v) => c.set(k, v) }
    FileSystem.get(tempPath.toUri, c).delete(tempPath, false)
  }

  override def close(): Unit = ()
}
