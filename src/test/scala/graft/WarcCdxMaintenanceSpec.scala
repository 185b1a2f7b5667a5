package graft

import org.apache.spark.sql.functions._

import graft.sources.{Warc, WarcCdx, WarcSink}

/** The r19 archive-index maintenance tier: incremental merge compaction
  * (new segments fold into the zipnum layout without re-shuffling the
  * corpus index), crash-atomic `cluster.idx` publication, the
  * wayback-style timestamp-closest lookup, and the record-id uniqueness
  * layer that keeps cross-archive revisit resolution collision-proof.
  */
class WarcCdxMaintenanceSpec extends SparkTestBase {

  import spark.implicits._

  private def mkPayloads(n: Int, host: Int => String = i => s"h${i % 3}") =
    (0 until n).map { i =>
      (s"https://${host(i)}.example/doc/$i",
        Warc.httpResponse(s"body number $i with é".getBytes("UTF-8"),
          "text/html; charset=utf-8"))
    }

  private def writeArchive(dir: String, rows: Seq[(String, Array[Byte])],
      date: String = "2026-01-01T00:00:00Z", parts: Int = 2): Unit =
    WarcSink.write(rows.toDF("target_uri", "payload")
      .withColumn("warc_date", lit(date)).repartition(parts), dir)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("mergeCompact ≡ full recompaction, and untouched parts are NOT rewritten") {
    // segment 1: hosts h0/h1/h2; segment 2 adds NEW captures only under
    // h2 — with 4 range parts the h0/h1 ranges must keep their files
    // byte-for-byte (the incremental contract: a daily segment must not
    // pay a corpus-index rewrite)
    val seg1 = tmp("graft_mrg_s1")
    val seg2 = tmp("graft_mrg_s2")
    val out = tmp("graft_mrg_out")
    val full = tmp("graft_mrg_full")
    writeArchive(seg1, mkPayloads(40))
    writeArchive(seg2, (100 until 112).map { i =>
      (s"https://h2.example/doc/$i",
        Warc.httpResponse(s"later capture $i".getBytes("UTF-8"), "text/html"))
    }, date = "2026-02-01T00:00:00Z")
    WarcCdx.compact(spark, seg1, out, nParts = 4)
    val before = new java.io.File(out).listFiles
      .filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> (f.lastModified, f.length)).toMap
    Thread.sleep(1100) // local-FS mtime granularity can be one second
    WarcCdx.mergeCompact(spark, seg2, out)
    // row-for-row what compacting everything from scratch yields
    val both = tmp("graft_mrg_both")
    for (d <- Seq(seg1, seg2); f <- new java.io.File(d).listFiles
         if f.getName.endsWith(".cdxj"))
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(both, d.hashCode.abs + "-" + f.getName))
    WarcCdx.compact(spark, both, full, nParts = 4)
    val mergedRows = WarcCdx.readCompacted(spark, out)
      .collect().map(_.toString).sorted
    val fullRows = WarcCdx.readCompacted(spark, full)
      .collect().map(_.toString).sorted
    mergedRows shouldBe fullRows
    mergedRows.length shouldBe 52
    // file-level incrementality + publish-only commit: every pre-merge
    // file is STILL THERE byte-for-byte (a merge never renames or deletes
    // a published part — pinned readers keep their snapshot), untouched
    // parts stay LISTED, and replaced parts were superseded by fresh
    // names in the manifest
    val after = new java.io.File(out).listFiles
      .filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> (f.lastModified, f.length)).toMap
    before.keySet.subsetOf(after.keySet) shouldBe true
    before.foreach { case (n, v) => after(n) shouldBe v } // bit-stable, all
    val entries = WarcCdx.clusterEntries(spark, out)
    val listed = entries.map(_._2).toSet
    val untouchedListed = before.keySet.intersect(listed)
    untouchedListed.nonEmpty shouldBe true // at least one part not rewritten
    (listed -- before.keySet).nonEmpty shouldBe true // fresh replacement names
    // global order still holds across files and lookups still prune
    entries.map(_._1) shouldBe entries.map(_._1).sorted
    WarcCdx.lookupPrefix(spark, out, "example,h2)/doc/100")
      .collect().map(_.getAs[String]("url")).toSeq shouldBe
      Seq("https://h2.example/doc/100")
    // vacuum is the explicit GC barrier: it deletes exactly the unlisted
    // (replaced) files and the live snapshot is unaffected
    val gone = WarcCdx.vacuum(spark, out)
    gone.toSet shouldBe (after.keySet -- listed)
    new java.io.File(out).listFiles.map(_.getName)
      .filter(_.startsWith("part-")).toSet shouldBe listed
    WarcCdx.readCompacted(spark, out)
      .collect().map(_.toString).sorted shouldBe fullRows
  }

  test("a reader pinned to a pre-merge manifest keeps a complete immutable snapshot") {
    // the MVCC contract the publish-only commit buys: resolve cluster.idx
    // once (what every read path does), and the files it lists stay
    // byte-identical at their paths through any number of merges — only
    // an explicit vacuum invalidates old snapshots
    val seg1 = tmp("graft_snap_s1")
    val seg2 = tmp("graft_snap_s2")
    val out = tmp("graft_snap_out")
    writeArchive(seg1, mkPayloads(24))
    writeArchive(seg2, (100 until 108).map { i =>
      (s"https://h1.example/doc/$i",
        Warc.httpResponse(s"cycle2 $i".getBytes("UTF-8"), "text/html"))
    }, date = "2026-02-01T00:00:00Z")
    WarcCdx.compact(spark, seg1, out, nParts = 3)
    val v1 = WarcCdx.clusterEntries(spark, out) // the pinned manifest
    val v1Rows = spark.read.text(v1.map(e => s"$out/${e._2}"): _*)
      .collect().map(_.getString(0)).sorted
    WarcCdx.mergeCompact(spark, seg2, out)
    val v2 = WarcCdx.clusterEntries(spark, out)
    v2 should not be v1
    // the pinned reader re-reads ITS files mid-merge-cycle: same bytes,
    // no mixed state, no missing file
    val v1Again = spark.read.text(v1.map(e => s"$out/${e._2}"): _*)
      .collect().map(_.getString(0)).sorted
    v1Again shouldBe v1Rows
    // the live manifest sees the merge
    WarcCdx.readCompacted(spark, out).count() shouldBe 32
    // vacuum invalidates the old snapshot EXPLICITLY: exactly the
    // superseded files go, and a stale path now fails loudly (file gone)
    // rather than serving mixed data
    val gone = WarcCdx.vacuum(spark, out).toSet
    gone shouldBe (v1.map(_._2).toSet -- v2.map(_._2).toSet)
    gone.foreach(n => new java.io.File(out, n).exists shouldBe false)
    WarcCdx.readCompacted(spark, out).count() shouldBe 32
  }

  test("mergeCompact folds below-minimum keys into part 0 and updates its entry") {
    val seg1 = tmp("graft_mrg_lo1")
    val seg2 = tmp("graft_mrg_lo2")
    val out = tmp("graft_mrg_lo_out")
    writeArchive(seg1, mkPayloads(20, _ => "mhost"))
    writeArchive(seg2, Seq(
      ("https://aaa.example/doc/0", // SURT key sorts below every existing key
        Warc.httpResponse("below-min".getBytes("UTF-8"), "text/html"))))
    WarcCdx.compact(spark, seg1, out, nParts = 3)
    val firstBefore = WarcCdx.clusterEntries(spark, out).head
    WarcCdx.mergeCompact(spark, seg2, out)
    val firstAfter = WarcCdx.clusterEntries(spark, out).head
    // part 0's REPLACEMENT holds the fold (publish-only commit: a fresh
    // file supersedes it in the manifest; the original stays on disk for
    // pinned readers until vacuum) and its entry records the new minimum
    firstAfter._2 should not be firstBefore._2
    new java.io.File(out, firstBefore._2).exists shouldBe true
    firstAfter._1 shouldBe "example,aaa)/doc/0" // new global minimum
    firstAfter._1 should be < firstBefore._1
    // and the new record is findable through the pruned path
    WarcCdx.lookupPrefix(spark, out, "example,aaa)").count() shouldBe 1L
  }

  test("mergeCompact and compact refuse in-place operation; empty segment is a no-op") {
    val seg = tmp("graft_mrg_guard_seg")
    val out = tmp("graft_mrg_guard_out")
    writeArchive(seg, mkPayloads(6))
    // compact must not overwrite its own input mid-read — equal dirs AND
    // the ancestor case (overwrite deletes outDir recursively)
    (the[IllegalArgumentException] thrownBy
      WarcCdx.compact(spark, seg, seg, nParts = 2)).getMessage should
      include("must not be the input dir")
    (the[IllegalArgumentException] thrownBy
      WarcCdx.compact(spark, s"$seg/sub", seg, nParts = 2)).getMessage should
      include("must not be the input dir")
    WarcCdx.compact(spark, seg, out, nParts = 2)
    (the[IllegalArgumentException] thrownBy
      WarcCdx.mergeCompact(spark, out, out)).getMessage should
      include("outDir must differ")
    // merging an empty segment changes nothing
    val empty = tmp("graft_mrg_empty")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(empty, "none.cdxj"), "")
    val rows = WarcCdx.readCompacted(spark, out).count()
    WarcCdx.mergeCompact(spark, empty, out)
    WarcCdx.readCompacted(spark, out).count() shouldBe rows
    // a crashed RENUMBER (parts stranded under _rn_ temp names) refuses
    // with a recovery hint instead of publishing an index missing them
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "_rn_part-000000000000"), "x")
    (the[IllegalArgumentException] thrownBy
      WarcCdx.mergeCompact(spark, seg, out)).getMessage should include("crashed")
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(out, "_rn_part-000000000000"))
  }

  test("cluster.idx publishes atomically: a torn temp is never visible") {
    val seg = tmp("graft_cdx_atomic_seg")
    val out = tmp("graft_cdx_atomic_out")
    writeArchive(seg, mkPayloads(12))
    WarcCdx.compact(spark, seg, out, nParts = 2)
    val entries = WarcCdx.clusterEntries(spark, out)
    // simulate a crash mid-publication: a half-written temp file on disk.
    // The reader must see the LAST COMMITTED index untouched — the commit
    // is a rename, so no reader ever observes a truncated cluster.idx
    // (r18 verdict: a direct create() could tear and silently lose parts)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "_cluster.idx.tmp"), "torn,key\tpart-g")
    WarcCdx.clusterEntries(spark, out) shouldBe entries
    // recompaction recovers: the stale temp is simply replaced
    WarcCdx.compact(spark, seg, out, nParts = 2)
    WarcCdx.clusterEntries(spark, out).length shouldBe entries.length
  }

  test("lookupClosest: nearest capture by |ts diff|, ties earlier, pruned read") {
    val arch = tmp("graft_closest_arch")
    val out = tmp("graft_closest_out")
    val dates = Seq("2026-01-01T00:00:00Z", "2026-03-01T00:00:00Z", "2026-06-01T00:00:00Z")
    val rows = for (i <- 0 until 12; d <- dates) yield
      (s"https://h${i % 3}.example/doc/$i",
        Warc.httpResponse(s"capture $i $d".getBytes("UTF-8"), "text/html"), d)
    WarcSink.write(rows.toDF("target_uri", "payload", "warc_date").repartition(2), arch)
    WarcCdx.compact(spark, arch, out, nParts = 3)
    val key = "example,h1)/doc/4"
    def closest(ts: String): String =
      WarcCdx.lookupClosest(spark, out, key, ts)
        .collect().map(_.getAs[String]("timestamp")).head
    closest("20260301000000") shouldBe "20260301000000" // exact hit
    closest("20260215000000") shouldBe "20260301000000" // rounds forward
    closest("20260401000000") shouldBe "20260301000000" // rounds back
    closest("20260201000000") shouldBe "20260101000000" // tie → earlier
    closest("19990101000000") shouldBe "20260101000000" // clamps to oldest
    closest("20991231235959") shouldBe "20260601000000" // clamps to newest
    // pruning is structural: the plan reads ONLY cluster.idx-selected
    // part files, fewer than the layout holds
    val scanned = WarcCdx.lookupClosest(spark, out, key, "20260301000000").inputFiles
    val allParts = new java.io.File(out).listFiles
      .count(_.getName.startsWith("part-"))
    scanned.length should be < allParts
    scanned.length shouldBe WarcCdx.selectParts(
      WarcCdx.clusterEntries(spark, out), key).length
    // a never-archived key answers empty, not an error
    WarcCdx.lookupClosest(spark, out, "zzz,never)", "20260101000000")
      .count() shouldBe 0L
    // malformed timestamps are rejected at the API edge
    an[IllegalArgumentException] should be thrownBy
      WarcCdx.lookupClosest(spark, out, key, "2026")
  }

  test("a part boundary inside one key's capture run loses no lookups (inclusive bound)") {
    // after a split cuts every N lines, a hot key's captures routinely
    // straddle a boundary: part i ends "K 2026-01", part i+1 opens
    // "K 2026-03". The r19 review caught selectParts' old strict `>`
    // upper bound excluding part i for prefix K — earlier captures
    // silently vanished from every lookup. Pin the inclusive bound end
    // to end: point, prefix, and batch paths all see both parts.
    val out = tmp("graft_boundary")
    def line(k: String, ts: String) = s"$k $ts " +
      "{\"url\":\"u:" + k + "\",\"digest\":\"sha1:X\",\"offset\":\"0\"," +
      "\"length\":\"1\",\"filename\":\"f\"}\n"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "part-000000000000"),
      line("aaa,a)", "20260101000000") + line("kkk,k)", "20260101000000"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "part-000001048576"),
      line("kkk,k)", "20260301000000") + line("zzz,z)", "20260101000000"))
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    WarcCdx.writeClusterIdx(fs, new org.apache.hadoop.fs.Path(out))
    val entries = WarcCdx.clusterEntries(spark, out)
    entries.map(_._1) shouldBe Seq("aaa,a)", "kkk,k)")
    // the boundary key selects BOTH parts
    WarcCdx.selectParts(entries, "kkk,k)") shouldBe
      Seq("part-000000000000", "part-000001048576")
    // prefix lookup sees both captures
    WarcCdx.lookupPrefix(spark, out, "kkk,k)").count() shouldBe 2L
    // point closest finds the EARLIER capture living in the earlier part
    WarcCdx.lookupClosest(spark, out, "kkk,k)", "20260101000000")
      .collect().head.getAs[String]("timestamp") shouldBe "20260101000000"
    // batch routing widens to the predecessor part and answers the same
    val got = WarcCdx.lookupClosestBatch(spark, out,
      Seq(("kkk,k)", "20260101000000")).toDF("urlkey", "timestamp"))
      .collect().map(_.getAs[String]("timestamp"))
    got shouldBe Array("20260101000000")
    // a run spanning THREE-plus parts (splits of a hot key): the batch
    // path must widen across the whole equal-firstKey run plus the part
    // where the run began — predecessor-only widening missed the first
    // part's captures (r19 second review catch)
    val out3 = tmp("graft_boundary3")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out3, "part-000000000000"),
      line("aaa,a)", "20260101000000") + line("kkk,k)", "20260101000000"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out3, "part-000001048576"),
      line("kkk,k)", "20260201000000") + line("kkk,k)", "20260301000000"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out3, "part-000002097152"),
      line("kkk,k)", "20260401000000") + line("zzz,z)", "20260101000000"))
    WarcCdx.writeClusterIdx(fs, new org.apache.hadoop.fs.Path(out3))
    val e3 = WarcCdx.clusterEntries(spark, out3)
    e3.map(_._1) shouldBe Seq("aaa,a)", "kkk,k)", "kkk,k)")
    WarcCdx.selectParts(e3, "kkk,k)").length shouldBe 3
    // the request routes to the LAST part of the run; the answer lives
    // in the FIRST — the run-wide widening must find it
    WarcCdx.lookupClosestBatch(spark, out3,
      Seq(("kkk,k)", "20260101000000")).toDF("urlkey", "timestamp"))
      .collect().map(_.getAs[String]("timestamp")) shouldBe
      Array("20260101000000")
    WarcCdx.lookupPrefix(spark, out3, "kkk,k)").count() shouldBe 4L
  }

  test("closest lookups survive damaged index lines and reject/drop empty urlkeys") {
    // a DAMAGED line parses to urlkey="" + timestamp="" — under ANSI mode
    // an empty-key request joining it would fail the whole batch on
    // cast('' AS BIGINT). The batch filter drops empty-key requests, the
    // point lookup rejects them, and valid requests answer normally with
    // the damaged line sitting right there in the scanned part.
    val out = tmp("graft_damaged")
    def line(k: String, ts: String) = s"$k $ts " +
      "{\"url\":\"u:" + k + "\",\"digest\":\"sha1:X\",\"offset\":\"0\"," +
      "\"length\":\"1\",\"filename\":\"f\"}\n"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "part-000000000000"),
      line("aaa,a)", "20260101000000") +
        "THIS LINE IS NOT CDXJ\n" +
        line("mmm,m)", "20260301000000"))
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    WarcCdx.writeClusterIdx(fs, new org.apache.hadoop.fs.Path(out))
    val got = WarcCdx.lookupClosestBatch(spark, out, Seq(
      ("aaa,a)", "20260101000000"),
      ("", "20260101000000"), // empty-key request: dropped, not a crash
      ("mmm,m)", "20260401000000")).toDF("urlkey", "timestamp"))
      .collect().map(r => (r.getAs[String]("urlkey"), r.getAs[String]("timestamp")))
      .sorted
    got shouldBe Array(("aaa,a)", "20260101000000"), ("mmm,m)", "20260301000000"))
    val e = intercept[IllegalArgumentException](
      WarcCdx.lookupClosest(spark, out, "", "20260101000000"))
    e.getMessage should include("non-empty urlkey")
    // the point path is damage-safe too for a real key sharing a part
    // with the damaged line
    WarcCdx.lookupClosest(spark, out, "mmm,m)", "20260101000000")
      .collect().map(_.getAs[String]("timestamp")) shouldBe Array("20260301000000")
  }

  test("fetch(verifyDigest) exempts parse-cap-truncated records instead of dropping them") {
    // a record longer than maxRecordBytes parses with a shortened payload
    // and truncated = true; its recomputed digest covers only the kept
    // prefix, so verification MUST exempt it — otherwise every oversized
    // archived record silently vanishes as if bit-rotten (r19 catch)
    val dir = tmp("graft_fetch_trunc")
    val big = ("A" * 3000).getBytes("UTF-8")
    WarcSink.write(Seq(("https://big.example/1",
      Warc.httpResponse(big, "text/plain"))).toDF("target_uri", "payload")
      .withColumn("warc_date", lit("2026-01-01T00:00:00Z")).repartition(1),
      dir, gzipMembers = false)
    val cdx = WarcCdx.read(spark, dir)
    // cap far below the record: parse truncates, verify must still return it
    val got = WarcCdx.fetch(cdx, dir, verifyDigest = true, maxRecordBytes = 512)
      .collect()
    got.length shouldBe 1
    got.head.truncated shouldBe true
    // with an adequate cap the same record verifies normally
    WarcCdx.fetch(cdx, dir, verifyDigest = true).collect().head.truncated shouldBe false
  }

  test("lookupClosestBatch resolves many requests in one pass, pruned and lookup-equivalent") {
    val arch = tmp("graft_closestb_arch")
    val out = tmp("graft_closestb_out")
    val dates = Seq("2026-01-01T00:00:00Z", "2026-03-01T00:00:00Z", "2026-06-01T00:00:00Z")
    val rows = for (i <- 0 until 12; d <- dates) yield
      (s"https://h${i % 3}.example/doc/$i",
        Warc.httpResponse(s"cap $i $d".getBytes("UTF-8"), "text/html"), d)
    WarcSink.write(rows.toDF("target_uri", "payload", "warc_date").repartition(2), arch)
    WarcCdx.compact(spark, arch, out, nParts = 3)
    val reqs = Seq(
      ("example,h1)/doc/4", "20260215000000", "a"),
      ("example,h1)/doc/4", "20260215000000", "a"), // exact duplicate: collapses
      ("example,h2)/doc/5", "20260101000000", "b"),
      ("example,h0)/doc/9", "20991231235959", "c"),
      ("zzz,never)", "20260101000000", "d"), // never archived: no row
      ("example,h0)/doc/3", "2026", "e")) // malformed ts: dropped
      .toDF("urlkey", "timestamp", "tag")
    val got = WarcCdx.lookupClosestBatch(spark, out, reqs)
      .select("urlkey", "req_ts", "timestamp", "tag").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    // per-request answers equal the point-lookup primitive's
    got shouldBe Array(
      ("example,h0)/doc/9", "20991231235959", "20260601000000", "c"),
      ("example,h1)/doc/4", "20260215000000", "20260301000000", "a"),
      ("example,h2)/doc/5", "20260101000000", "20260101000000", "b"))
    // pruning is structural: three requests under two hosts touch fewer
    // parts than the layout holds (the driver-side part list is what the
    // scan reads)
    val entries = WarcCdx.clusterEntries(spark, out)
    val targeted = Seq("example,h1)/doc/4", "example,h2)/doc/5",
      "example,h0)/doc/9", "zzz,never)", "example,h0)/doc/3")
      .flatMap(k => WarcCdx.selectParts(entries, k)).distinct
    targeted.length should be <= entries.length
  }

  test("fetch skips damaged index lines instead of failing the job") {
    // parseLines maps a malformed line to null coordinates by contract;
    // r18's fetch crashed the whole job on the first null (non-nullable
    // tuple encoder). Now damaged lines drop and every healthy hit fetches.
    val dir = tmp("graft_fetch_tolerant")
    writeArchive(dir, mkPayloads(5), parts = 1)
    val evil = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".cdxj")).head.toPath
    val warcName = new java.io.File(dir).listFiles
      .map(_.getName).find(n => n.endsWith(".warc") || n.endsWith(".warc.gz")).get
    java.nio.file.Files.writeString(evil,
      java.nio.file.Files.readString(evil) +
        "broken,line 20260101000000 {\"url\":\"x\"}\n" + // json missing coords
        "no json shape at all\n" +
        // numerically-plausible lies: past-EOF coordinates (EOF mid-read
        // must drop the row, not fail the task), a filename no archive
        // has, a non-numeric offset (ANSI try_cast), a negative offset
        "z,eof) 20260101000000 {\"url\":\"x\",\"offset\":\"99999999\"," +
        "\"length\":\"64\",\"filename\":\"" + warcName + "\"}\n" +
        "z,gone) 20260101000000 {\"url\":\"x\",\"offset\":\"0\"," +
        "\"length\":\"64\",\"filename\":\"zz_no_such.warc\"}\n" +
        "z,nan) 20260101000000 {\"url\":\"x\",\"offset\":\"nope\"," +
        "\"length\":\"64\",\"filename\":\"" + warcName + "\"}\n" +
        "z,neg) 20260101000000 {\"url\":\"x\",\"offset\":\"-5\"," +
        "\"length\":\"64\",\"filename\":\"" + warcName + "\"}\n")
    // drop the Hadoop local-FS checksum sidecar — the damage IS the test
    java.nio.file.Files.deleteIfExists(
      evil.getParent.resolve("." + evil.getFileName + ".crc"))
    val cdx = WarcCdx.read(spark, dir)
    cdx.count() shouldBe 11
    WarcCdx.fetch(cdx, dir).collect().length shouldBe 5
  }

  test("fetch honors relative-subpath filenames but drops every root-escaping shape") {
    // the multi-dir feature's security boundary: a filename field is
    // UNTRUSTED index content — a subpath under the root resolves, but
    // absolute paths, `..` climbs, and scheme-qualified names must drop
    // like any damaged row (never fail the job, never read outside dir)
    val root = tmp("graft_fetch_subdir")
    val cycle = s"$root/c1"
    WarcSink.write(mkPayloads(4).toDF("target_uri", "payload")
      .withColumn("warc_date", lit("2026-01-01T00:00:00Z")).repartition(1),
      cycle, cdxFilenamePrefix = "c1")
    val cdx = WarcCdx.read(spark, cycle)
    cdx.select("filename").head().getString(0) should startWith("c1/")
    // the subpath resolves against the PARENT root
    WarcCdx.fetch(cdx, root, verifyDigest = true).count() shouldBe 4
    // plant a readable file OUTSIDE the root a hostile line points at
    // with correct coordinates — the drop must be the guard, not luck
    val outside = tmp("graft_fetch_outside")
    val victim = new java.io.File(cycle).listFiles
      .find(f => f.getName.endsWith(".warc.gz")).get
    java.nio.file.Files.copy(victim.toPath,
      java.nio.file.Paths.get(outside, victim.getName))
    val evil = Seq("/" + outside.stripPrefix("/") + "/" + victim.getName,
      s"../../${outside.split('/').last}/${victim.getName}",
      s"c1/../../${outside.split('/').last}/${victim.getName}",
      s"file:$outside/${victim.getName}")
    val hostile = evil.map(f => ("k", "20260101000000", "u", null: String,
      null: String, null: String, 0L, victim.length, f))
      .toDF("urlkey", "timestamp", "url", "mime", "digest", "rid",
        "offset", "length", "filename")
    WarcCdx.fetch(hostile, root).count() shouldBe 0
    // and the sink refuses to MINT an escaping or line-corrupting prefix
    // in the first place (the field embeds verbatim in a JSON index line)
    for (bad <- Seq("/abs", "a/../b", "..", "a//b", "s3a:x", "a/",
        "a\"b", "a\\b", "a b", ".hidden"))
      an[IllegalArgumentException] should be thrownBy
        WarcSink.write(mkPayloads(1).toDF("target_uri", "payload"),
          tmp("graft_badpfx"), cdxFilenamePrefix = bad)
  }

  test("fetch(verifyDigest) drops bit-rotten records; clean ones and revisits pass") {
    // at archive scale, cold-storage bit-rot is expected-case: the index
    // digest doubles as an end-to-end integrity check on the replay path
    val dir = tmp("graft_fetch_verify")
    WarcSink.write(mkPayloads(6).toDF("target_uri", "payload")
      .withColumn("warc_date", lit("2026-01-01T00:00:00Z")).repartition(1),
      dir, gzipMembers = false)
    val cdx = WarcCdx.read(spark, dir)
    WarcCdx.fetch(cdx, dir, verifyDigest = true).count() shouldBe 6 // clean: all pass
    // flip one payload byte of doc/2's record in place (uncompressed
    // layout: the byte at offset+length-5 sits inside the body)
    val row = cdx.filter(col("url") === "https://h2.example/doc/2")
      .select("filename", "offset", "length").head()
    val f = java.nio.file.Paths.get(dir, row.getString(0))
    val bytes = java.nio.file.Files.readAllBytes(f)
    val at = (row.getLong(1) + row.getLong(2) - 5).toInt
    bytes(at) = (bytes(at) ^ 0x41).toByte
    java.nio.file.Files.write(f, bytes)
    java.nio.file.Files.deleteIfExists(
      f.getParent.resolve("." + f.getFileName + ".crc"))
    // unverified fetch happily returns the damaged record...
    WarcCdx.fetch(cdx, dir).count() shouldBe 6
    // ...verified fetch drops exactly it
    val ok = WarcCdx.fetch(cdx, dir, verifyDigest = true).collect()
    ok.length shouldBe 5
    ok.map(_.target_uri) should not contain "https://h2.example/doc/2"
  }

  test("continuous-crawl workflow: per-cycle incremental index maintenance ≡ full rebuild") {
    // the full loop the archive tier exists for: cycle 1 crawls and
    // compacts; every later cycle marks revisits against the LIVE
    // compacted index, writes its (deduped) archive into ITS OWN
    // directory — indexed under a per-cycle subpath prefix, so the merged
    // corpus index spans cycle dirs — and merges its new index lines in;
    // at no point does the corpus index rebuild or an archive file move.
    val parent = tmp("graft_cont")
    val idx = tmp("graft_cont_idx")
    def crawl(cycle: Int, lo: Int, hi: Int, history: Option[String]): String = {
      val dir = s"$parent/c$cycle"
      val df = (lo until hi).map { i =>
        // every third doc repeats an earlier payload — cross-cycle dedup
        val src = if (i % 3 == 0 && i >= 10) i - 10 else i
        (s"https://h${i % 2}.example/doc/$i",
          Warc.httpResponse(s"content of $src".getBytes("UTF-8"), "text/html"))
      }.toDF("target_uri", "payload")
        .withColumn("warc_date", lit(f"2026-0$cycle%d-01T00:00:00Z"))
      val marked = history match {
        case Some(h) => WarcSink.markRevisits(df, WarcCdx.readCompacted(spark, h))
        case None => df
      }
      WarcSink.write(marked.repartition(1), dir, cdxFilenamePrefix = s"c$cycle")
      dir
    }
    val c1 = crawl(1, 0, 12, None)
    WarcCdx.compact(spark, c1, idx, nParts = 2)
    val c2 = crawl(2, 12, 24, Some(idx))
    WarcCdx.mergeCompact(spark, c2, idx, maxPartLines = 20)
    WarcCdx.vacuum(spark, idx) // per-cycle GC: the real loop runs it too
    val c3 = crawl(3, 24, 36, Some(idx))
    WarcCdx.mergeCompact(spark, c3, idx, maxPartLines = 20)
    // the incrementally-maintained index equals a from-scratch compaction
    val full = tmp("graft_cont_full")
    val allIdx = tmp("graft_cont_allidx")
    for (d <- Seq(c1, c2, c3); f <- new java.io.File(d).listFiles
         if f.getName.endsWith(".cdxj"))
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(allIdx, d.hashCode.abs + "-" + f.getName))
    WarcCdx.compact(spark, allIdx, full, nParts = 2)
    WarcCdx.readCompacted(spark, idx).collect().map(_.toString).sorted shouldBe
      WarcCdx.readCompacted(spark, full).collect().map(_.toString).sorted
    // cross-cycle dedup really happened: later cycles hold revisits whose
    // referents live in EARLIER archives, and resolution reconstructs all
    val revisits = WarcCdx.readCompacted(spark, idx)
      .filter(col("mime") === "warc/revisit").count()
    revisits should be >= 8L // cycles 2-3: ids 12,15,…,33 (every 3rd)
    val recs = Warc.read(spark, s"$parent/*")
    val resolved = Warc.resolveRevisits(recs)
    resolved.count() shouldBe 36
    resolved.filter(_.payload.isEmpty).count() shouldBe 0 // every payload restored
    // MULTI-DIRECTORY replay: the merged index's filename fields carry
    // the per-cycle subpaths (c1/part-…, c2/part-…), so ONE fetch rooted
    // at the parent replays every cycle's records without moving a file
    val hits = WarcCdx.readCompacted(spark, idx)
    hits.select("filename").distinct().collect().map(_.getString(0))
      .foreach(f => f should fullyMatch regex "c[123]/part-.*")
    val fetched = WarcCdx.fetch(
      hits.filter(col("mime") =!= "warc/revisit"), parent, verifyDigest = true)
    fetched.count() shouldBe 36 - revisits
  }

  test("record ids separate captures: same slot, different content or date") {
    // r18 advice (high): md5(uri, partition, row) alone collides across
    // crawl cycles that land the same URI in the same slot — the SURT
    // schedule makes that likely. The digest+date components now separate
    // captures; identical captures still replay to the identical id.
    val id = graft.sources.WarcSink.recordId(
      "https://a/1", "2026-01-01T00:00:00Z", "sha1:AAA", 0, 0L)
    graft.sources.WarcSink.recordId(
      "https://a/1", "2026-01-01T00:00:00Z", "sha1:AAA", 0, 0L) shouldBe id
    graft.sources.WarcSink.recordId(
      "https://a/1", "2026-01-01T00:00:00Z", "sha1:BBB", 0, 0L) should not be id
    graft.sources.WarcSink.recordId(
      "https://a/1", "2026-02-01T00:00:00Z", "sha1:AAA", 0, 0L) should not be id
    graft.sources.WarcSink.recordId(
      "https://a/1", "2026-01-01T00:00:00Z", "sha1:AAA", 0, 1L) should not be id
  }

  test("resolveRevisits stays collision-proof: duplicate referent ids never multiply rows") {
    // a FOREIGN archive's ids are outside our control — two responses
    // sharing one record id plus a revisit citing it must resolve to
    // exactly one row per revisit (r18: the join multiplied output and
    // patched an arbitrary payload in)
    val recs = Seq(
      Warc.WarcRecord("f", 0, "response", "https://a/1", "2026-01-01T00:00:00Z",
        "text/html", 3L, "one".getBytes("UTF-8"), false, "urn:uuid:dup", ""),
      Warc.WarcRecord("f", 1, "response", "https://a/1", "2026-02-01T00:00:00Z",
        "text/html", 3L, "two".getBytes("UTF-8"), false, "urn:uuid:dup", ""),
      Warc.WarcRecord("f", 2, "revisit", "https://a/1", "2026-03-01T00:00:00Z",
        "", 0L, Array.empty[Byte], false, "urn:uuid:rv", "urn:uuid:dup"))
      .toDS()
    val resolved = Warc.resolveRevisits(recs).collect()
    resolved.length shouldBe 3 // 2 responses + exactly 1 resolved revisit
    val rv = resolved.filter(_.record_id == "urn:uuid:rv")
    rv.length shouldBe 1
    // deterministic referent: min (payload, ctype, len) struct → "one"
    new String(rv.head.payload, "UTF-8") shouldBe "one"
    rv.head.warc_type shouldBe "response"
  }

  test("mergeCompact split policy: oversized parts split by renaming, never rewriting neighbors") {
    // a hot key range merged every cycle must not grow one part without
    // bound — maxPartLines splits the rewritten part into consecutive
    // parts whose numbers subdivide the gap to the successor (name order
    // stays range order), while untouched parts keep their files
    val seg1 = tmp("graft_split_s1")
    val seg2 = tmp("graft_split_s2")
    val out = tmp("graft_split_out")
    writeArchive(seg1, mkPayloads(30))
    writeArchive(seg2, (100 until 120).map { i =>
      (s"https://h2.example/doc/$i",
        Warc.httpResponse(s"wave $i".getBytes("UTF-8"), "text/html"))
    }, date = "2026-02-01T00:00:00Z")
    WarcCdx.compact(spark, seg1, out, nParts = 3)
    val before = new java.io.File(out).listFiles
      .filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> (f.lastModified, f.length)).toMap
    Thread.sleep(1100)
    WarcCdx.mergeCompact(spark, seg2, out, maxPartLines = 8)
    // the manifest gained parts (a split happened), the global order
    // holds across files, and every REWRITTEN part — all carry FRESH
    // names under the publish-only commit — respects the bound
    // (untouched parts keep their size until a merge next touches them:
    // the policy applies on rewrite, by design)
    val entries = WarcCdx.clusterEntries(spark, out)
    val listed = entries.map(_._2)
    listed.length should be > before.size // at least one split happened
    entries.map(_._1) shouldBe entries.map(_._1).sorted
    listed shouldBe listed.sorted // name order == range order
    for (f <- listed if !before.contains(f))
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(out, f)).size should be <= 8
    // untouched parts kept their exact files, still listed
    val untouched = listed.filter(n =>
      before.contains(n) && before(n) ==
        (new java.io.File(out, n).lastModified, new java.io.File(out, n).length))
    untouched.nonEmpty shouldBe true
    // content is lossless: 50 lines total, all findable by pruned lookup
    WarcCdx.readCompacted(spark, out).count() shouldBe 50
    WarcCdx.lookupPrefix(spark, out, "example,h2)/doc/11")
      .collect().map(_.getAs[String]("url")).sorted shouldBe
      ((110 to 119).map(i => s"https://h2.example/doc/$i") :+
        "https://h2.example/doc/11").sorted.toArray // doc/11 matches the prefix too
    // a SECOND merge cycle splits again inside the now-smaller gaps —
    // the numbering keeps subdividing without disturbing order
    val seg3 = tmp("graft_split_s3")
    writeArchive(seg3, (200 until 216).map { i =>
      (s"https://h2.example/doc/$i",
        Warc.httpResponse(s"wave3 $i".getBytes("UTF-8"), "text/html"))
    }, date = "2026-03-01T00:00:00Z")
    WarcCdx.mergeCompact(spark, seg3, out, maxPartLines = 8)
    val entries3 = WarcCdx.clusterEntries(spark, out)
    entries3.map(_._1) shouldBe entries3.map(_._1).sorted
    entries3.map(_._2) shouldBe entries3.map(_._2).sorted
    WarcCdx.readCompacted(spark, out).count() shouldBe 66
  }

  test("mergeCompact renumbers (renames only) when a split's gap is exhausted") {
    // hand-build a layout whose part numbers are ADJACENT — no room to
    // insert a split — and merge with a tiny maxPartLines: the layout
    // must renumber (cheap renames, no data rewrite) and then split fine
    val out = tmp("graft_renum_out")
    def line(k: String) = s"$k 20260101000000 " +
      "{\"url\":\"u\",\"offset\":\"0\",\"length\":\"1\",\"filename\":\"f\"}\n"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "part-000000000000"),
      line("aaa,a)") + line("bbb,b)"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "part-000000000001"), // adjacent: gap 1
      line("mmm,m)") + line("nnn,n)"))
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    WarcCdx.writeClusterIdx(fs, new org.apache.hadoop.fs.Path(out))
    val seg = tmp("graft_renum_seg")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(seg, "s.cdxj"),
      line("aab,x)") + line("aac,y)") + line("aad,z)"))
    WarcCdx.mergeCompact(spark, seg, out, maxPartLines = 2)
    val entries = WarcCdx.clusterEntries(spark, out)
    entries.map(_._1) shouldBe entries.map(_._1).sorted
    entries.map(_._2) shouldBe entries.map(_._2).sorted
    WarcCdx.readCompacted(spark, out).count() shouldBe 7
    for (f <- entries.map(_._2))
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(out, f)).size should be <= 2
    // the untouched part's CONTENT survived the renumber byte-for-byte
    WarcCdx.lookupPrefix(spark, out, "mmm,m)").count() shouldBe 1L
    // and no temp/aside debris remains (the writer lock releases too)
    new java.io.File(out).listFiles
      .count(f => f.getName.startsWith("_rn_") ||
        f.getName.startsWith("_graft_cdx_writer") ||
        f.getName.startsWith("_graft_cdx_merge")) shouldBe 0
    // the renumber published an INTERIM generation right after the
    // renames (r19 advice: a crash before the merge's final publish must
    // not leave the live manifest citing renamed-away names) and retired
    // the staled pre-renumber generation; the merge's own commit follows
    WarcCdx.manifestVersions(spark, out) shouldBe Seq(2L, 3L)
  }

  test("manifest generations: versioned publish, pinned time travel, vacuum retention") {
    // the r19 verdict's top item: publication must never touch the live
    // manifest (the old delete-then-rename had a no-manifest window), and
    // retained generations are NAMED snapshots a reader can pin across
    // later merges — vacuum's `retain` is the time-travel horizon
    val seg1 = tmp("graft_gen_s1")
    val seg2 = tmp("graft_gen_s2")
    val seg3 = tmp("graft_gen_s3")
    val out = tmp("graft_gen_out")
    writeArchive(seg1, mkPayloads(18))
    writeArchive(seg2, (100 until 106).map { i =>
      (s"https://h1.example/doc/$i",
        Warc.httpResponse(s"c2 $i".getBytes("UTF-8"), "text/html"))
    }, date = "2026-02-01T00:00:00Z")
    writeArchive(seg3, (200 until 206).map { i =>
      (s"https://h2.example/doc/$i",
        Warc.httpResponse(s"c3 $i".getBytes("UTF-8"), "text/html"))
    }, date = "2026-03-01T00:00:00Z")
    WarcCdx.compact(spark, seg1, out, nParts = 3)
    WarcCdx.manifestVersions(spark, out) shouldBe Seq(1L)
    val rows1 = WarcCdx.readCompacted(spark, out).collect().map(_.toString).sorted
    WarcCdx.mergeCompact(spark, seg2, out)
    WarcCdx.manifestVersions(spark, out) shouldBe Seq(1L, 2L)
    val rows2 = WarcCdx.readCompacted(spark, out).collect().map(_.toString).sorted
    WarcCdx.mergeCompact(spark, seg3, out)
    WarcCdx.manifestVersions(spark, out) shouldBe Seq(1L, 2L, 3L)
    // every retained generation reads its EXACT historical snapshot
    WarcCdx.readCompacted(spark, out, 1L).collect().map(_.toString).sorted shouldBe rows1
    WarcCdx.readCompacted(spark, out, 2L).collect().map(_.toString).sorted shouldBe rows2
    WarcCdx.readCompacted(spark, out).count() shouldBe 30
    // the PRUNED lookups pin too: a doc merged in cycle 2 is visible to
    // the live index and to generation 2, but not "as of" generation 1
    val k100 = "example,h1)/doc/100"
    WarcCdx.lookupPrefix(spark, out, k100).count() shouldBe 1L
    WarcCdx.lookupPrefix(spark, out, k100, version = 1L).count() shouldBe 0L
    WarcCdx.lookupClosest(spark, out, k100, "20260201000000").count() shouldBe 1L
    WarcCdx.lookupClosest(spark, out, k100, "20260201000000", version = 1L)
      .count() shouldBe 0L
    val req = Seq((k100, "20260201000000")).toDF("urlkey", "timestamp")
    WarcCdx.lookupClosestBatch(spark, out, req).count() shouldBe 1L
    WarcCdx.lookupClosestBatch(spark, out, req, version = 1L).count() shouldBe 0L
    // a seg1 doc answers identically through the pinned and live paths
    val k3 = "example,h0)/doc/3"
    WarcCdx.lookupClosest(spark, out, k3, "20260101000000", version = 1L)
      .collect().map(_.getAs[String]("timestamp")) shouldBe Array("20260101000000")
    // vacuum(retain = 2): generation 1 retires — its manifest file goes
    // and parts ONLY it listed are GC'd; generations 2 and 3 stay whole
    WarcCdx.vacuum(spark, out, retain = 2)
    WarcCdx.manifestVersions(spark, out) shouldBe Seq(2L, 3L)
    (the[java.io.FileNotFoundException] thrownBy
      WarcCdx.readCompacted(spark, out, 1L)).getMessage should include("cluster.idx")
    WarcCdx.readCompacted(spark, out, 2L).collect().map(_.toString).sorted shouldBe rows2
    WarcCdx.readCompacted(spark, out).count() shouldBe 30
    // default vacuum (retain = 1) keeps only the live generation, and the
    // live snapshot is byte-identical after the GC
    WarcCdx.vacuum(spark, out)
    WarcCdx.manifestVersions(spark, out) shouldBe Seq(3L)
    WarcCdx.readCompacted(spark, out).count() shouldBe 30
    an[IllegalArgumentException] should be thrownBy
      WarcCdx.vacuum(spark, out, retain = 0)
  }

  test("readers racing merge commits never error and only see complete manifests") {
    // the availability fault the old delete-then-rename publish had: a
    // reader resolving the manifest in the delete→rename window got
    // FileNotFoundException. With fresh-name generations there IS no
    // window — hammer the read path from another thread across two real
    // merge commits and require zero errors and only complete snapshots
    val seg1 = tmp("graft_race_s1")
    val seg2 = tmp("graft_race_s2")
    val seg3 = tmp("graft_race_s3")
    val out = tmp("graft_race_out")
    writeArchive(seg1, mkPayloads(18))
    writeArchive(seg2, (100 until 108).map { i =>
      (s"https://h0.example/doc/$i",
        Warc.httpResponse(s"w2 $i".getBytes("UTF-8"), "text/html"))
    }, date = "2026-02-01T00:00:00Z")
    writeArchive(seg3, (200 until 208).map { i =>
      (s"https://h1.example/doc/$i",
        Warc.httpResponse(s"w3 $i".getBytes("UTF-8"), "text/html"))
    }, date = "2026-03-01T00:00:00Z")
    WarcCdx.compact(spark, seg1, out, nParts = 3)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val reads = new java.util.concurrent.atomic.AtomicLong
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop) {
        try {
          val entries = WarcCdx.clusterEntries(spark, out)
          // a complete snapshot: every listed file exists at read time
          // (merges never delete; only vacuum does, and none runs here)
          entries.foreach { e =>
            if (!new java.io.File(out, e._2).exists())
              failures.add(new AssertionError(
                s"manifest listed a missing file: ${e._2}"))
          }
          reads.incrementAndGet()
        } catch { case t: Throwable => failures.add(t) }
      }
    })
    reader.start()
    try {
      WarcCdx.mergeCompact(spark, seg2, out)
      WarcCdx.mergeCompact(spark, seg3, out)
    } finally { stop = true; reader.join(30000) }
    failures.forEach(t => fail(s"racing reader failed: $t"))
    reads.get() should be > 0L
    WarcCdx.readCompacted(spark, out).count() shouldBe 34
  }

  test("a crash before the manifest rename leaves the prior generation live") {
    // two crash shapes the versioned publish must absorb: (a) an orphan
    // half-written temp (writer died before its rename) is invisible to
    // readers and vacuumed; (b) the LATEST generation lost entirely (its
    // rename never happened) — readers resolve the highest COMPLETE
    // generation, whose files the publish-only commit left in place
    val seg1 = tmp("graft_crash_s1")
    val seg2 = tmp("graft_crash_s2")
    val out = tmp("graft_crash_out")
    writeArchive(seg1, mkPayloads(12))
    writeArchive(seg2, (100 until 104).map { i =>
      (s"https://h1.example/doc/$i",
        Warc.httpResponse(s"c2 $i".getBytes("UTF-8"), "text/html"))
    }, date = "2026-02-01T00:00:00Z")
    WarcCdx.compact(spark, seg1, out, nParts = 2)
    val rows1 = WarcCdx.readCompacted(spark, out).collect().map(_.toString).sorted
    // (a) orphan temp: ignored by resolution, removed by vacuum
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "_cluster.idx.tmp"), "torn,key\tpart-g")
    WarcCdx.readCompacted(spark, out).collect().map(_.toString).sorted shouldBe rows1
    WarcCdx.vacuum(spark, out)
    new java.io.File(out, "_cluster.idx.tmp").exists() shouldBe false
    // (b) merge commits v2, then "crash" loses it: v1 still serves its
    // complete snapshot — the layout is never manifest-less
    WarcCdx.mergeCompact(spark, seg2, out)
    WarcCdx.manifestVersions(spark, out) shouldBe Seq(1L, 2L)
    java.nio.file.Files.delete(java.nio.file.Paths.get(out, "cluster.idx.v2"))
    WarcCdx.manifestVersions(spark, out) shouldBe Seq(1L)
    WarcCdx.readCompacted(spark, out).collect().map(_.toString).sorted shouldBe rows1
  }

  test("writer lock: a second merge/vacuum fails fast naming the holder, and releases cleanly") {
    val seg1 = tmp("graft_lock_s1")
    val seg2 = tmp("graft_lock_s2")
    val out = tmp("graft_lock_out")
    writeArchive(seg1, mkPayloads(10))
    writeArchive(seg2, Seq(("https://h0.example/doc/100",
      Warc.httpResponse("x".getBytes("UTF-8"), "text/html"))),
      date = "2026-02-01T00:00:00Z")
    WarcCdx.compact(spark, seg1, out, nParts = 2)
    // a foreign writer holds the lock: both maintenance ops refuse fast,
    // naming the holder and the recovery step, and touch NOTHING
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "_graft_cdx_writer.lock"),
      "mergeCompact pid=424242 host=elsewhere since=2026-01-01T00:00:00Z")
    val before = WarcCdx.readCompacted(spark, out).count()
    val em = the[IllegalStateException] thrownBy
      WarcCdx.mergeCompact(spark, seg2, out)
    em.getMessage should include("pid=424242")
    em.getMessage should include("delete the lock")
    val ev = the[IllegalStateException] thrownBy WarcCdx.vacuum(spark, out)
    ev.getMessage should include("pid=424242")
    WarcCdx.readCompacted(spark, out).count() shouldBe before
    WarcCdx.manifestVersions(spark, out) shouldBe Seq(1L)
    // the documented recovery: delete the dead holder's lock and retry —
    // and a completed op leaves no lock behind (including the no-op and
    // error exits, which the guard test above also releases through)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(out, "_graft_cdx_writer.lock"))
    WarcCdx.mergeCompact(spark, seg2, out)
    new java.io.File(out, "_graft_cdx_writer.lock").exists() shouldBe false
    WarcCdx.vacuum(spark, out)
    new java.io.File(out, "_graft_cdx_writer.lock").exists() shouldBe false
    WarcCdx.readCompacted(spark, out).count() shouldBe before + 1
    // RECOMPACTING an existing layout is a destructive write too — the
    // same lock gates it (a compact racing a merge would delete its
    // files); a fresh output dir needs no lock
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "_graft_cdx_writer.lock"),
      "vacuum pid=424242 host=elsewhere since=2026-01-01T00:00:00Z")
    (the[IllegalStateException] thrownBy
      WarcCdx.compact(spark, seg1, out, nParts = 2)).getMessage should
      include("pid=424242")
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(out, "_graft_cdx_writer.lock"))
    WarcCdx.compact(spark, seg1, out, nParts = 2)
    new java.io.File(out, "_graft_cdx_writer.lock").exists() shouldBe false
    WarcCdx.readCompacted(spark, out).count() shouldBe before
  }

  test("manifest names are round-trip canonical: v0 and leading zeros are foreign files") {
    // ADVICE r20: 'cluster.idx.v0' used to parse as generation 0 (aliasing
    // the legacy 'cluster.idx') and 'cluster.idx.v01' as 1 (duplicating
    // v1) — duplicate/aliased versions whose canonical manifestName
    // resolves to a different or missing file, skewing vacuum's
    // takeRight(retain) and readManifest resolution. Only names
    // manifestName itself produces are versions now.
    WarcCdx.manifestVersionOf("cluster.idx") shouldBe Some(0L)
    WarcCdx.manifestVersionOf("cluster.idx.v1") shouldBe Some(1L)
    WarcCdx.manifestVersionOf("cluster.idx.v17") shouldBe Some(17L)
    WarcCdx.manifestVersionOf("cluster.idx.v0") shouldBe None
    WarcCdx.manifestVersionOf("cluster.idx.v01") shouldBe None
    WarcCdx.manifestVersionOf("cluster.idx.v007") shouldBe None
    // and a layout carrying such foreign files resolves as if they were
    // any other debris
    val out = tmp("graft_cdx_canon")
    val seg = tmp("graft_cdx_canon_seg")
    writeArchive(seg, mkPayloads(4))
    WarcCdx.compact(spark, seg, out, nParts = 1)
    val rows = WarcCdx.readCompacted(spark, out).collect().map(_.toString).sorted
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "cluster.idx.v0"), "zzz\tno-such-part\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "cluster.idx.v01"), "zzz\tno-such-part\n")
    WarcCdx.manifestVersions(spark, out) shouldBe Seq(1L)
    WarcCdx.readCompacted(spark, out).collect().map(_.toString).sorted shouldBe rows
  }

  test("cluster.idx first keys are exact even when the first line exceeds one read chunk") {
    // r18 advice: a 64 KiB-truncated first key is NOT harmless — it is
    // part i's lower bound AND part i-1's UPPER bound in selectParts, so
    // truncating it below a lookup prefix would wrongly prune the
    // PREVIOUS part. firstKey now reads to the delimiter, whatever the
    // length; writeClusterIdx records the exact key.
    val out = tmp("graft_cdx_longkey")
    val longKey = "zz," + ("k" * 70000) + ")" // key alone exceeds the 64 KiB chunk
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "part-00000-x.txt"),
      "aaa,key) 20260101000000 {\"url\":\"a\"}\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "part-00001-x.txt"),
      s"$longKey 20260101000000 {\"url\":\"z\"}\n")
    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = outPath.getFileSystem(spark.sessionState.newHadoopConf())
    WarcCdx.firstKey(fs,
      new org.apache.hadoop.fs.Path(out, "part-00001-x.txt")) shouldBe longKey
    WarcCdx.writeClusterIdx(fs, outPath)
    val entries = WarcCdx.clusterEntries(spark, out)
    // the long key survives untruncated in the index...
    entries.map(_._1) shouldBe Seq("aaa,key)", longKey)
    // ...so a prefix between the two keys still selects the FIRST part
    // (a key truncated to "zz,kk…k" with the trailing ')' lost would
    // still exceed "bbb", but one truncated below the prefix would have
    // flipped the upper-bound test — exactness closes the class of bug)
    WarcCdx.selectParts(entries, "bbb,key)") shouldBe Seq("part-00000-x.txt")
  }
}
