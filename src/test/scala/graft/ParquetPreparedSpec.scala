package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.graft.Internals

import graft.prepared.{Params, PreparedStatements, ScanRebind}

/** End-to-end ports of the reference Parquet integration tests
  * (`/root/reference/datafusion-dynamic-filter/tests/preparable_context_parquet_test.rs:86-232`),
  * plus the execute-time pushdown proof: ScanRebind must make the parquet
  * scan itself skip data, not merely keep results correct.
  */
class ParquetPreparedSpec extends SparkTestBase {

  /** users parquet with MANY row groups (small block size), sorted by id so
    * row-group statistics make point lookups prunable.
    */
  private lazy val parquetDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_parquet_users").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/users"
    spark.range(0, 200000).map(i => (i, s"user_$i", (i % 1000).toDouble))
      .toDF("id", "name", "score")
      .coalesce(1)
      .sortWithinPartitions("id")
      .write.option("parquet.block.size", 64 * 1024).parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("pusers")
    path
  }

  private def prepare(sql: String) = { parquetDir; PreparedStatements.prepare(spark, sql) }

  // parquet_test.rs:86-131 — PK lookup on a parquet table
  test("parquet point lookup") {
    val rows = prepare("SELECT id, name FROM pusers WHERE id = $1")
      .execute(Map("$1" -> 4242L)).collect()
    rows shouldBe Array(Row(4242L, "user_4242"))
  }

  // parquet_test.rs:134-189 — repeated execution with different keys
  test("parquet repeated execution") {
    val st = prepare("SELECT name FROM pusers WHERE id = $1")
    st.execute(Map("$1" -> 7L)).collect() shouldBe Array(Row("user_7"))
    st.execute(Map("$1" -> 199999L)).collect() shouldBe Array(Row("user_199999"))
  }

  // parquet_test.rs:192-232 — two params + projection
  test("parquet two params with projection") {
    val df = prepare("SELECT id FROM pusers WHERE id >= $1 AND id <= $2")
      .execute(Map("$1" -> 100L, "$2" -> 104L))
    df.columns shouldBe Array("id")
    df.collect().map(_.getLong(0)).sorted shouldBe Array(100L, 101L, 102L, 103L, 104L)
  }

  /** The moral equivalent of parquet_test.rs:86-131's pushdown assertion:
    * after binding, ScanRebind re-pushes the concrete conjuncts into the
    * scan's dataFilters, and the scan's own numOutputRows metric shows
    * row-group pruning actually fired. Fails if `ScanRebind.rebind` is
    * replaced with identity.
    */
  test("ScanRebind makes the parquet scan prune") {
    val st = prepare("SELECT id, name FROM pusers WHERE id = $1")
    val total = 200000L

    def scanRows(withRebind: Boolean): (Long, Long) = {
      val bound = Params.bind(st.physicalPlan, Map("$1" -> 123456L))
      val plan = if (withRebind) ScanRebind.rebind(bound) else bound
      val df = Internals.dfFromPhysical(spark, plan)
      val n = df.count()
      val scan = plan.collectFirst { case s: FileSourceScanExec => s }.get
      (n, scan.metrics("numOutputRows").value)
    }

    val (hit, prunedRows) = scanRows(withRebind = true)
    hit shouldBe 1L
    // with rebind the scan emits only the surviving row group(s)
    prunedRows should be < total / 10

    val (hitNo, fullRows) = scanRows(withRebind = false)
    hitNo shouldBe 1L
    // identity rebind: the scan reads everything, the filter runs above it
    fullRows shouldBe total
  }

  test("column pruning survives the opaque dynamic-filter node") {
    val st = prepare("SELECT id, name FROM pusers WHERE id = $1")
    val scan = st.physicalPlan.collectFirst { case s: FileSourceScanExec => s }.get
    // the scan must read only the referenced columns, not score
    scan.requiredSchema.fieldNames.toSet shouldBe Set("id", "name")
  }

  test("dynamic filter participates in whole-stage codegen") {
    val st = prepare("SELECT id, name FROM pusers WHERE id = $1")
    val bound = ScanRebind.rebind(Params.bind(st.physicalPlan, Map("$1" -> 5L)))
    // the exec carries a codegen-stage star — scan → filter → project fuse
    // into one generated span instead of breaking at the dynamic filter
    bound.toString should include regex """\*\(\d+\) DynamicFilter"""
  }

  test("rebound dataFilters appear in the scan") {
    val st = prepare("SELECT id FROM pusers WHERE id = $1")
    val bound = ScanRebind.rebind(Params.bind(st.physicalPlan, Map("$1" -> 5L)))
    val scan = bound.collectFirst { case s: FileSourceScanExec => s }.get
    assert(scan.dataFilters.nonEmpty, "expected the bound conjunct in dataFilters")
  }

  // Placeholders inside a subquery's own physical plan (VERDICT r1 §4).
  // $1 sits against max(score), not a column, so its type is declared.
  private def subquerySt = {
    parquetDir
    PreparedStatements.prepare(
      spark,
      "SELECT count(*) AS n FROM pusers WHERE score > (SELECT max(score) - $1 FROM pusers)",
      Map("$1" -> org.apache.spark.sql.types.DoubleType))
  }

  test("placeholder inside a scalar subquery binds") {
    val st = subquerySt
    // max(score) = 999; score in [0, 1000); threshold 999 - 0.5 → only score 999
    st.execute(Map("$1" -> 0.5)).collect() shouldBe Array(Row(200L))
    // rebind with a different margin: scores 998, 999 → 400 rows
    st.execute(Map("$1" -> 1.5)).collect() shouldBe Array(Row(400L))
  }

  test("missing param inside a subquery is detected") {
    val ex = intercept[IllegalArgumentException] { subquerySt.execute(Map.empty[String, Any]) }
    ex.getMessage should include("'$1' was not provided a value")
  }

  // AQE opt-in (prepare(..., adaptive = true)): a prepared heavy shape —
  // e.g. a fact⋈fact join over skewed keys at cluster scale — can trade
  // per-execute planning (~10s of ms) for AQE's skew splitting / runtime
  // coalescing, which the default frozen-physical-plan mode must forgo.
  test("a prepared join can opt into AQE") {
    parquetDir
    val sql = """SELECT count(*) AS n FROM pusers a JOIN pusers b ON a.id = b.id
                |WHERE a.score >= $1""".stripMargin
    val st = PreparedStatements.prepare(spark, sql, adaptive = true)
    st.isAdaptive shouldBe true

    val df = st.execute(Map("$1" -> 999.0))
    df.collect() shouldBe Array(Row(200L))
    // the executed plan really is adaptive — the frozen-plan mode never is
    df.queryExecution.executedPlan shouldBe
      a[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec]

    // rebinding re-plans with the new literal
    st.execute(Map("$1" -> 998.0)).collect() shouldBe Array(Row(400L))

    val static = prepare(sql)
    static.isAdaptive shouldBe false
    static.execute(Map("$1" -> 999.0)).collect() shouldBe Array(Row(200L))
  }

  test("adaptive prepare still fails fast on a missing param") {
    parquetDir
    val st = PreparedStatements.prepare(
      spark, "SELECT count(*) AS n FROM pusers WHERE score >= $1", adaptive = true)
    val ex = intercept[IllegalArgumentException] { st.execute(Map.empty[String, Any]) }
    ex.getMessage should include("'$1' was not provided a value")
  }

  // identical parameterized subtrees on both sides of a self-join can be
  // planned through ReusedExchangeExec — a leaf whose referenced exchange is
  // NOT in `children`, so binding must reach through it explicitly
  test("placeholder inside a reused exchange binds") {
    val st = prepare(
      """SELECT count(*) AS n FROM pusers a JOIN pusers b ON a.id = b.id
        |WHERE a.score >= $1 AND b.score >= $1""".stripMargin)
    st.execute(Map("$1" -> 999.0)).collect() shouldBe Array(Row(200L))
    st.execute(Map("$1" -> 998.0)).collect() shouldBe Array(Row(400L))
  }
}
