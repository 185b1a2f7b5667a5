package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.prepared.PreparedStatements

/** End-to-end ports of the reference MemTable integration tests
  * (`/root/reference/datafusion-dynamic-filter/tests/preparable_context_basic_test.rs:61-303`)
  * on an in-memory users table, plus prepare-time guard tests.
  */
class PreparedStatementsSpec extends SparkTestBase {

  private lazy val users = {
    import spark.implicits._
    val df = Seq(
      (1, "ada", 10.0), (2, "bo", 20.5), (3, "cy", 30.0),
      (4, "dee", 4.25), (5, "ed", 55.0)
    ).toDF("id", "name", "amount")
    df.createOrReplaceTempView("users")
    df
  }

  private def prepare(sql: String) = { users; PreparedStatements.prepare(spark, sql) }

  // basic_test.rs:61-65 — trait smoke: constant select
  test("prepare SELECT 1") {
    prepare("SELECT 1 AS one").execute().collect() shouldBe Array(Row(1))
  }

  // basic_test.rs:68-103 — single int param point lookup
  test("point lookup with one int param") {
    val rows = prepare("SELECT id, name FROM users WHERE id = $1")
      .execute(Map("$1" -> 3)).collect()
    rows shouldBe Array(Row(3, "cy"))
  }

  // basic_test.rs:106-145 — repeated execution with different keys
  test("repeated execution rebinds") {
    val st = prepare("SELECT name FROM users WHERE id = $1")
    st.execute(Map("$1" -> 1)).collect() shouldBe Array(Row("ada"))
    st.execute(Map("$1" -> 5)).collect() shouldBe Array(Row("ed"))
    st.execute(Map("$1" -> 1)).collect() shouldBe Array(Row("ada"))
  }

  // basic_test.rs:148-183 — string param
  test("string equality param") {
    val rows = prepare("SELECT id FROM users WHERE name = $1")
      .execute(Map("$1" -> "dee")).collect()
    rows shouldBe Array(Row(4))
  }

  // basic_test.rs:186-218 — two params, range conjunction
  test("two params range") {
    val rows = prepare("SELECT id FROM users WHERE id >= $1 AND id <= $2")
      .execute(Map("$1" -> 2, "$2" -> 4)).collect().map(_.getInt(0)).sorted
    rows shouldBe Array(2, 3, 4)
  }

  // basic_test.rs:221-241 — no matches
  test("empty result for unmatched key") {
    prepare("SELECT id FROM users WHERE id = $1")
      .execute(Map("$1" -> 999)).collect() shouldBe empty
  }

  // basic_test.rs:244-273 — projection subset + column count
  test("projection subset") {
    val df = prepare("SELECT name FROM users WHERE id = $1").execute(Map("$1" -> 2))
    df.columns shouldBe Array("name")
    df.collect() shouldBe Array(Row("bo"))
  }

  // basic_test.rs:276-303 — COUNT(*) over filtered input
  test("count over filtered input") {
    prepare("SELECT count(*) AS cnt FROM users WHERE id >= $1")
      .execute(Map("$1" -> 3)).collect() shouldBe Array(Row(3L))
  }

  test("positional execute maps args in order") {
    val rows = prepare("SELECT id FROM users WHERE id >= $1 AND id <= $2")
      .execute(2, 3).collect().map(_.getInt(0)).sorted
    rows shouldBe Array(2, 3)
  }

  test("named :param markers bind by name") {
    val rows = prepare("SELECT id FROM users WHERE name = :who")
      .execute(Map("$who" -> "cy")).collect()
    rows shouldBe Array(Row(3))
  }

  test("question-mark markers are numbered left to right") {
    val rows = prepare("SELECT id FROM users WHERE id >= ? AND id <= ?")
      .execute(Map("$1" -> 2, "$2" -> 3)).collect().map(_.getInt(0)).sorted
    rows shouldBe Array(2, 3)
  }

  // preparable_context.rs:18-28 — DDL is rejected at prepare time
  test("DDL rejected") {
    users
    val ex = intercept[UnsupportedOperationException] {
      PreparedStatements.prepare(spark, "CREATE TABLE t2 (id INT)")
    }
    ex.getMessage should include("not supported in prepared statements")
  }

  // Placeholder-position pinning (VERDICT r3 §10): LIMIT/OFFSET counts must
  // be analysis-time constants in Spark, so a placeholder there is rejected
  // at prepare with an actionable message — not at first execute with
  // Spark's generic IS_UNFOLDABLE error.
  test("LIMIT placeholder rejected at prepare with a clear message") {
    users
    val ex = intercept[UnsupportedOperationException] {
      PreparedStatements.prepare(spark, "SELECT id FROM users ORDER BY id LIMIT $1",
        Map("$1" -> org.apache.spark.sql.types.IntegerType))
    }
    ex.getMessage should include("LIMIT/OFFSET")
    ex.getMessage should include("inline the value")
  }

  test("OFFSET placeholder rejected at prepare") {
    users
    intercept[UnsupportedOperationException] {
      PreparedStatements.prepare(spark, "SELECT id FROM users ORDER BY id LIMIT 5 OFFSET $1",
        Map("$1" -> org.apache.spark.sql.types.IntegerType))
    }
  }

  // ...while a placeholder in a projection (a legal value position outside
  // any predicate) prepares and binds fine
  test("placeholder in the select list binds") {
    users
    val st = PreparedStatements.prepare(spark, "SELECT id, $1 AS tag FROM users WHERE id = 1",
      Map("$1" -> org.apache.spark.sql.types.StringType))
    st.execute(Map("$1" -> "run_a")).collect().map(_.getString(1)) shouldBe Array("run_a")
    st.execute(Map("$1" -> "run_b")).collect().map(_.getString(1)) shouldBe Array("run_b")
  }

  test("INSERT rejected") {
    users
    intercept[UnsupportedOperationException] {
      PreparedStatements.prepare(spark, "INSERT INTO users VALUES (9, 'x', 1.0)")
    }
  }

  // param_resolver.rs:156-168 semantics at the statement level
  test("missing param at execute errors with the placeholder name") {
    val st = prepare("SELECT id FROM users WHERE id = $1")
    val ex = intercept[IllegalArgumentException] { st.execute(Map.empty[String, Any]) }
    ex.getMessage should include("'$1' was not provided a value")
  }

  test("type inferred from comparison sibling") {
    // name = $1 infers StringType; amount > $2 infers DoubleType
    val st = prepare("SELECT id FROM users WHERE name = $1 AND amount > $2")
    st.execute(Map("$1" -> "ed", "$2" -> 50.0)).collect() shouldBe Array(Row(5))
  }

  // rule.rs:107-123 shape: the filtered relation is a projection of
  // LITERAL aliases — no table schema carries `id`, so the sibling alias
  // itself must type the placeholder (no paramTypes declared)
  test("type inferred from a literal-alias sibling (rule.rs:110-113 shape)") {
    val st = PreparedStatements.prepare(
      spark, "SELECT * FROM (SELECT 1 AS id, 'test' AS name) WHERE id = $1")
    st.execute(Map("$1" -> 1)).collect() shouldBe Array(Row(1, "test"))
    st.execute(Map("$1" -> 2)).collect() shouldBe Array.empty[Row]
  }

  // the enclosing comparison's column type must win over a nested
  // arithmetic literal's — `amount = $1 + 1` types $1 double (amount's
  // type), never int from the `+ 1` (first-write-wins traversal order)
  test("column sibling outranks a nested arithmetic literal") {
    val st = prepare("SELECT id FROM users WHERE amount = $1 + 1")
    st.execute(Map("$1" -> 19.5)).collect() shouldBe Array(Row(2)) // 19.5 + 1 = 20.5 = bo
  }

  test("type inferred from a literal sibling") {
    // no column on either side of `$1 = 'ed'` — the literal types it
    val st = prepare("SELECT id FROM users WHERE id = 1 AND $1 = 'ed'")
    st.execute(Map("$1" -> "ed")).collect() shouldBe Array(Row(1))
    st.execute(Map("$1" -> "zz")).collect() shouldBe Array.empty[Row]
  }

  // ADVICE r15: a REUSED named param meeting a bare literal in one clause
  // and a typed column in another must take the column's type whatever the
  // clause ORDER — ranked inference, not pure first-write-wins
  test("column sibling outranks an earlier literal sibling for a reused param") {
    // literal INT comparison FIRST: :p would be IntegerType under pure
    // first-write-wins; amount's DoubleType must win whatever the order,
    // so binding 20.5 survives un-truncated and matches row 2
    val st = prepare("SELECT id FROM users WHERE :p = 5 OR amount = :p")
    st.execute(Map("$p" -> 20.5)).collect() shouldBe Array(Row(2))
    val st2 = prepare("SELECT id FROM users WHERE amount = :p OR :p = 5")
    st2.execute(Map("$p" -> 20.5)).collect() shouldBe Array(Row(2))
  }

  test("uninferable placeholder type fails fast at prepare") {
    users
    val ex = intercept[IllegalArgumentException] {
      PreparedStatements.prepare(spark, "SELECT $1 AS v FROM users")
    }
    ex.getMessage should include("Cannot infer the type of placeholder '$1'")
  }

  test("declared paramTypes override inference failure") {
    users
    val st = PreparedStatements.prepare(
      spark, "SELECT $1 AS v FROM users WHERE id = 1", Map("$1" -> DoubleType))
    st.execute(Map("$1" -> 2.5)).collect() shouldBe Array(Row(2.5))
  }

  test("IN-list of placeholders") {
    val rows = prepare("SELECT id FROM users WHERE id IN ($1, $2)")
      .execute(Map("$1" -> 1, "$2" -> 4)).collect().map(_.getInt(0)).sorted
    rows shouldBe Array(1, 4)
  }

  test("placeholder in HAVING over an aggregate") {
    val st = prepare(
      "SELECT count(*) AS n FROM users GROUP BY id % 2 HAVING count(*) >= $1")
    st.execute(Map("$1" -> 3L)).collect() shouldBe Array(Row(3L))
    st.execute(Map("$1" -> 1L)).collect().map(_.getLong(0)).sorted shouldBe Array(2L, 3L)
  }

  test("BETWEEN with placeholders") {
    val rows = prepare("SELECT id FROM users WHERE id BETWEEN $1 AND $2")
      .execute(Map("$1" -> 2, "$2" -> 3)).collect().map(_.getInt(0)).sorted
    rows shouldBe Array(2, 3)
  }

  test("LIKE with a placeholder pattern") {
    val rows = prepare("SELECT id FROM users WHERE name LIKE $1")
      .execute(Map("$1" -> "d%")).collect().map(_.getInt(0))
    rows shouldBe Array(4)
  }

  test("arithmetic on a placeholder") {
    val rows = prepare("SELECT id FROM users WHERE id = $1 + 1")
      .execute(Map("$1" -> 2)).collect().map(_.getInt(0))
    rows shouldBe Array(3)
  }

  test("placeholder in a join condition") {
    import spark.implicits._
    users
    Seq((1, 100), (2, 200), (3, 300)).toDF("uid", "bonus").createOrReplaceTempView("bonuses")
    val st = prepare(
      "SELECT u.id, b.bonus FROM users u JOIN bonuses b ON u.id = b.uid + $1")
    st.execute(Map("$1" -> 1)).collect().map(r => (r.getInt(0), r.getInt(1))).sorted shouldBe
      Array((2, 100), (3, 200), (4, 300)).toSeq
  }

  test("concurrent executes of one statement are independent") {
    // no shared mutable filter state (unlike the reference's
    // target_partitions=1 restriction, README.md:56)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val st = prepare("SELECT id FROM users WHERE id = $1")
    val results = Await.result(
      Future.sequence((1 to 5).map { k =>
        Future(st.execute(Map("$1" -> k)).collect().map(_.getInt(0)).toSeq)
      }), 2.minutes)
    results shouldBe (1 to 5).map(Seq(_))
  }
}
