package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graft.ColumnBridge.{colOf, exprOf}

/** Custom table-generating function (UDTF): word n-gram shingles of a text
  * column, one output row per shingle. The custom-`Generator` analog of the
  * reference's UDTF registry snapshot
  * (`/root/reference/datafusion-dynamic-filter/src/parameterized_statement.rs:30-49`) —
  * planned through Spark's `Generate` node exactly like built-in `explode`,
  * so the fan-out runs partition-local with no shuffle.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    if (s == null) Nil
    else {
      val tokens = s.toString.toLowerCase.split(" ")
      if (tokens.length < n) Nil
      else (0 to tokens.length - n).map { i =>
        InternalRow(UTF8String.fromString(tokens.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordShinglesFunction {
  def wordShingles(text: Column, n: Int = 3): Column = colOf(WordShingles(exprOf(text), n))
}
