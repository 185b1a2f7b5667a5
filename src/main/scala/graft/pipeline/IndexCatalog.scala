package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Version-pointer catalog for on-disk ANN indexes — the durable form of
  * index maintenance the r13 ledger left open: [[Similarity.compactIvfIndex]]'s
  * move-aside swap has a window where a reader that resolved the index
  * path before the swap reads files the rename just moved. A pointer flip
  * removes the window: index versions live side by side under the root
  * (`root/v=1`, `root/v=2`, …), the live one is named by a `_CURRENT` file,
  * and publishing a new version is ONE atomic rename of `_CURRENT` — a
  * reader resolves the pointer once and its version's files never move or
  * disappear underneath it while it runs.
  *
  * Retention is the usual table-format discipline: [[publish]] keeps the
  * previous version (in-flight readers may still be on it) and deletes
  * anything older, so the footprint is bounded at two versions. The
  * pointer write is create-temp + rename: where the filesystem supports an
  * overwrite-capable atomic rename (HDFS via `FileContext` with
  * `Options.Rename.OVERWRITE`) the flip really is one atomic replace; on
  * Hadoop's LocalFileSystem, which refuses overwrite-by-rename, the flip
  * degrades to delete+rename with a transient no-pointer window — which is
  * why [[currentVersion]] falls back to the highest on-disk `v=N` directory
  * when the pointer is momentarily absent, so readers racing a publish
  * still resolve a live version instead of failing. Object stores without
  * atomic rename want their real catalog (this IS the miniature of that
  * contract). Concurrent publishers are last-writer-wins on the pointer;
  * serialize publishes externally if version numbers can race.
  */
object IndexCatalog {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(root: String) = new Path(root, "_CURRENT")

  /** The live version number, if the root has ever been published. When the
    * pointer file is transiently absent (a LocalFileSystem publish is between
    * its delete and rename) the highest fully-written `v=N` directory is the
    * version the in-flight publish is flipping to or past, so falling back to
    * it returns a published version rather than a spurious "unpublished".
    */
  def currentVersion(spark: SparkSession, root: String): Option[Int] = {
    val f = fs(spark, root)
    val p = pointer(root)
    if (!f.exists(p)) highestVersionDir(spark, root)
    else {
      val in = f.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](256)
        Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
          .foreach(n => buf.write(chunk, 0, n))
        Some(new String(buf.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8).trim.toInt)
      } finally in.close()
    }
  }

  /** Highest on-disk `v=N` data directory (side tables like `v=N__centroids`
    * excluded) — the no-pointer fallback for [[currentVersion]].
    */
  private def highestVersionDir(spark: SparkSession, root: String): Option[Int] = {
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) None
    else {
      val vDir = "^v=(\\d+)$".r
      val versions = Option(f.listStatus(rootPath)).getOrElse(Array.empty)
        .filter(_.isDirectory)
        .flatMap(st => vDir.findFirstMatchIn(st.getPath.getName).map(_.group(1).toInt))
      if (versions.isEmpty) None else Some(versions.max)
    }
  }

  /** Directory for a version's data (exists or not). */
  def versionDir(root: String, version: Int): String =
    new Path(root, s"v=$version").toString

  /** The live data directory — what probes should read. Throws if nothing
    * has been published (an unpublished root has no live index).
    */
  def resolve(spark: SparkSession, root: String): String =
    versionDir(root, currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no _CURRENT pointer under $root — publish a version first")))

  /** Atomically flip `_CURRENT` to `version` (whose data must already be
    * fully written under [[versionDir]]), then prune versions older than
    * the immediately-previous one. Readers that resolved before the flip
    * keep a stable view: their version's files are never touched by the
    * flip, and survive one more publish cycle before pruning.
    */
  def publish(spark: SparkSession, root: String, version: Int): Unit = {
    val f = fs(spark, root)
    require(f.exists(new Path(versionDir(root, version))),
      s"version $version has no data under ${versionDir(root, version)} — write it first")
    val tmp = new Path(root, s"_CURRENT.tmp-$version")
    val out = f.create(tmp, true)
    try out.write(version.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // prefer a single atomic replace: FileContext.rename(OVERWRITE) is one
    // operation on HDFS, leaving no window where the pointer is absent
    val overwrote =
      try {
        org.apache.hadoop.fs.FileContext
          .getFileContext(tmp.toUri, spark.sparkContext.hadoopConfiguration)
          .rename(tmp, pointer(root), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        true
      } catch { case _: Exception => false }
    if (!overwrote) {
      // LocalFileSystem refuses overwrite-by-rename — fall back to
      // delete+rename; [[currentVersion]]'s highest-v=N fallback covers the
      // transient no-pointer window this leaves for racing readers
      f.delete(pointer(root), false)
      if (!f.rename(tmp, pointer(root)))
        throw new java.io.IOException(s"could not flip $root/_CURRENT to v$version")
    }
    // prune everything older than the previous version (side tables that
    // version with the data — e.g. v=N__centroids — prune on its schedule)
    val keep = Set(version, version - 1)
    val vDir = "^v=(\\d+)(__[a-z]+)?$".r
    Option(f.listStatus(new Path(root))).getOrElse(Array.empty).foreach { st =>
      st.getPath.getName match {
        case vDir(v, _) if !keep.contains(v.toInt) => f.delete(st.getPath, true)
        case _ => ()
      }
    }
  }
}
