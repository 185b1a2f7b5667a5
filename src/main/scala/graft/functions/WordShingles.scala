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

/** Word n-gram shingles with their xxhash64, one row per shingle — the
  * hot-path form behind [[graft.pipeline.TextAnalysis.duplicatedSpans]]'s
  * hash-first span mining. Semantics are BIT-EXACT with the declarative
  * chain `explode(transform(sequence(...), i => array_join(slice(
  * split(lower(text), " "), i, n), " ")))` + `xxhash64(span)`:
  * tokenization is UTF8String.toLowerCase + regex-split on " " with
  * limit -1 (trailing empties kept, matching Spark's `split`), spans are
  * concatWs(" ") over token slices (matching `array_join`), and the hash
  * is XXH64 over the span's UTF8 bytes with Spark's seed 42 (matching
  * `xxhash64`) — so a downstream pass may interchangeably key on
  * `xxhash64(col("span"))`. The point of existing at all: the transform/
  * slice HOF chain is interpreted per ELEMENT (the r12 lesson — no
  * codegen, per-slice lambda projection overhead), while this generator
  * tokenizes each document once at JVM speed inside the same
  * partition-local `Generate` fan-out as built-in `explode`.
  */
case class WordShingleHashes(
    child: Expression, n: Int, withHashes: Boolean = true, withPos: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def elementSchema: StructType = {
    val base =
      if (withHashes)
        StructField("__h", org.apache.spark.sql.types.LongType, nullable = false) ::
          StructField("span", StringType, nullable = false) :: Nil
      else
        StructField("span", StringType, nullable = false) :: Nil
    StructType(
      if (withPos)
        StructField("pos", org.apache.spark.sql.types.IntegerType, nullable = false) :: base
      else base)
  }

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    if (s == null) Nil
    else {
      // limit -1 keeps trailing empty tokens — Spark's split() semantics
      val tokens = s.toLowerCase.split(space, -1)
      if (tokens.length < n) Nil
      else (0 to tokens.length - n).map { i =>
        val span = UTF8String.concatWs(space, java.util.Arrays.copyOfRange(tokens, i, i + n): _*)
        val base: Seq[Any] =
          if (withHashes) {
            val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
              span.getBaseObject, span.getBaseOffset, span.numBytes, 42L)
            Seq(h, span)
          } else Seq(span)
        // pos is the shingle's 0-BASED first-word index — what a masking
        // consumer needs to address the words the span covers
        InternalRow.fromSeq(if (withPos) i +: base else base)
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordShingleHashesFunction {
  /** `withHashes = false` emits the span column alone and skips the XXH64
    * pass entirely — for string-keyed consumers (ADVICE r15: the unhashed
    * decontamination paths were paying a per-shingle hash whose column was
    * discarded on the corpus-wide fan-out).
    */
  def wordShingleHashes(
      text: Column, n: Int, withHashes: Boolean = true, withPos: Boolean = false): Column =
    colOf(WordShingleHashes(exprOf(text), n, withHashes, withPos))
}
