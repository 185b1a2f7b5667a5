package graft

import graft.sources.WarcCdx

/** Model-based end-to-end randomization of the WHOLE CDX maintenance
  * tier: random crawl segments fold into a compacted layout through
  * `compact` + repeated `mergeCompact` (with a tiny `maxPartLines` so
  * splits and boundary-straddling key runs happen CONSTANTLY), and every
  * read path — full readCompacted, prefix lookup, point closest, batch
  * closest — must agree with a driver-side model over the pooled lines.
  * [[CdxLayoutProps]] proves the pure selection arithmetic; this spec
  * proves the arithmetic composed with real files, real shuffles, real
  * renames, and real merges. Seeded: failures replay exactly.
  */
class CdxMaintenanceModelSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // small alphabets force duplicate keys, shared prefixes, and capture
  // runs longer than maxPartLines — the hard layout shapes
  private def randKey(rnd: scala.util.Random): String = {
    val len = 1 + rnd.nextInt(3)
    (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString + ",x)"
  }
  private def randTs(rnd: scala.util.Random): String =
    f"2026${1 + rnd.nextInt(9)}%02d01${rnd.nextInt(24)}%02d0000"

  private def renderLine(key: String, ts: String, i: Int): String =
    s"""$key $ts {"url":"u:$key","offset":"${i * 100}","length":"100","filename":"f$i.warc"}"""

  test("random segments: compact + merges ≡ model through every read path") {
    val rnd = new scala.util.Random(0xC0FFEE)
    (0 until 4).foreach { round =>
      val nSegs = 1 + rnd.nextInt(3)
      val segs = (0 until nSegs).map { s =>
        val n = 1 + rnd.nextInt(30)
        (0 until n).map(i => (randKey(rnd), randTs(rnd), s * 1000 + i))
      }
      val segDirs = segs.zipWithIndex.map { case (lines, s) =>
        val d = tmp(s"graft_model_seg${round}_$s")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, "idx.cdxj"),
          lines.map { case (k, t, i) => renderLine(k, t, i) }
            .mkString("", "\n", "\n").getBytes("UTF-8"))
        d
      }
      val out = tmp(s"graft_model_out$round")
      val maxPartLines = 2L + rnd.nextInt(4) // tiny: force splits
      WarcCdx.compact(spark, segDirs.head, out, nParts = 1 + rnd.nextInt(3))
      segDirs.tail.foreach(sd => WarcCdx.mergeCompact(spark, sd, out, maxPartLines))

      // the model: every line of every segment, as (key, ts, url)
      val model = segs.flatten.map { case (k, t, i) => (k, t, s"u:$k", i) }

      // 0. manifest generations: compact published gen 1, each merge the
      // next — and generation g pins EXACTLY segments 0..g-1's pooled
      // lines, whatever merged after it (the MVCC model)
      val gens = WarcCdx.manifestVersions(spark, out)
      gens shouldBe (1L to nSegs.toLong)
      def pinnedMultiset(g: Long) = WarcCdx.readCompacted(spark, out, g)
        .select("urlkey", "timestamp", "offset").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2) / 100))
        .sorted.toSeq
      def modelMultiset(nSegsIn: Int) = segs.take(nSegsIn).flatten
        .map { case (k, t, i) => (k, t, i.toLong) }.sorted
      gens.foreach(g => assert(pinnedMultiset(g) == modelMultiset(g.toInt),
        s"generation $g round $round"))

      // 1. full read returns exactly the pooled multiset
      val readBack = WarcCdx.readCompacted(spark, out)
        .select("urlkey", "timestamp", "url", "offset").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3) / 100))
      readBack.sorted.toSeq shouldBe
        model.map { case (k, t, u, i) => (k, t, u, i.toLong) }.sorted

      // 2. prefix lookup ≡ model filter, for random prefixes (including
      // ones matching nothing and the shared one-letter prefixes)
      (0 until 6).foreach { _ =>
        val p = (if (rnd.nextBoolean()) randKey(rnd) else randKey(rnd).take(1 + rnd.nextInt(2)))
        val got = WarcCdx.lookupPrefix(spark, out, p)
          .select("urlkey", "timestamp").collect()
          .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
        val want = model.collect { case (k, t, _, _) if k.startsWith(p) => (k, t) }.sorted
        assert(got == want, s"prefix '$p' round $round (seed replays)")
      }

      // 3. point closest ≡ model arithmetic (nearest |ts diff|, ties
      // earlier), for keys present and absent
      def modelClosest(key: String, ts: String): Option[String] = {
        val c = model.filter(_._1 == key).map(_._2)
        if (c.isEmpty) None
        else Some(c.minBy(t => (math.abs(t.toLong - ts.toLong), t.toLong)))
      }
      val probes = (0 until 6).map(_ => (randKey(rnd), randTs(rnd)))
      probes.foreach { case (k, ts) =>
        val got = WarcCdx.lookupClosest(spark, out, k, ts)
          .collect().map(_.getAs[String]("timestamp")).headOption
        assert(got == modelClosest(k, ts), s"closest($k, $ts) round $round")
      }

      // 3.5 vacuum mid-round at a RANDOM retention: deleting superseded
      // files must change NOTHING a live-manifest reader sees, every
      // RETAINED generation still pins its exact multiset, and a dropped
      // generation fails loudly rather than serving a different snapshot
      val retain = 1 + rnd.nextInt(2)
      WarcCdx.vacuum(spark, out, retain)
      val kept = gens.takeRight(retain)
      WarcCdx.manifestVersions(spark, out) shouldBe kept
      WarcCdx.readCompacted(spark, out).count() shouldBe model.length.toLong
      kept.foreach(g => assert(pinnedMultiset(g) == modelMultiset(g.toInt),
        s"retained generation $g round $round"))
      gens.filterNot(kept.contains).foreach(g =>
        an[java.io.FileNotFoundException] should be thrownBy
          WarcCdx.readCompacted(spark, out, g))

      // 4. batch closest ≡ the same model, all probes in one pass
      val batch = WarcCdx.lookupClosestBatch(spark, out,
        probes.distinct.toDF("urlkey", "timestamp"))
        .select("urlkey", "req_ts", "timestamp").collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getString(2))).toMap
      probes.distinct.foreach { case (k, ts) =>
        assert(batch.get((k, ts)) == modelClosest(k, ts),
          s"batch closest($k, $ts) round $round")
      }
    }
  }
}
