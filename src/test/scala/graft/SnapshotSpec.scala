package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Snapshot

/** Corpus-snapshot diffing: per-id added/removed/changed/unchanged. */
class SnapshotSpec extends SparkTestBase {

  import spark.implicits._

  test("diff labels every id with the right status") {
    val oldSnap = Seq(
      (1L, "kept as is"),
      (2L, "gets edited"),
      (3L, "gets deleted"),
      (4L, null.asInstanceOf[String])      // null content, carried over
    ).toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, "kept as is"),
      (2L, "edited indeed"),
      (4L, null.asInstanceOf[String]),     // null = null → unchanged (<=>)
      (5L, "brand new")
    ).toDF("doc_id", "text")
    val got = Snapshot.diff(oldSnap, newSnap)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    got shouldBe Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added")
    // null-to-value transition is a change, not an 'unchanged' null leak
    val flipped = Snapshot.diff(
      Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      Seq((4L, "now has text")).toDF("doc_id", "text"))
      .head().getString(1)
    flipped shouldBe "changed"
  }

  test("diffCounts summarizes, empty sides degrade to all-added / all-removed") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    Snapshot.diffCounts(empty, a).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap shouldBe Map("added" -> 2L)
    Snapshot.diffCounts(a, empty).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap shouldBe Map("removed" -> 2L)
    Snapshot.diffCounts(a, a).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap shouldBe Map("unchanged" -> 2L)
  }
}
