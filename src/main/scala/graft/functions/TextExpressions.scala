package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graft.ColumnBridge.{colOf, exprOf}

/** Native Catalyst expressions for the text/dedup pipeline (SURVEY.md §7
  * phase 4). All are deterministic, seed-driven, and single-pass — each doc's
  * signature is computed map-side with no shuffle, so they scale linearly
  * with the corpus.
  *
  * Codegen: each expression emits a direct call to its own `compute` method
  * through the codegen `references` array, so it participates in whole-stage
  * codegen (a `CodegenFallback` would interpret the ENTIRE subtree per row,
  * including the upstream `split`/`lower` — the r1 minhash bottleneck).
  */
private[functions] object TextHashing {
  /** splitmix64 — stateless counter-mode 64-bit mixer. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** FNV-1a over UTF-8 bytes, then mixed — cheap, good-dispersion base hash. */
  def hashUtf8(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    mix(h)
  }
}

/** MinHash signature of a token array: `numHashes` min-values over the
  * doc's `shingleSize`-token shingles, each shingle hashed once and then
  * re-dispersed through `numHashes` affine transforms (the standard
  * one-base-hash minhash family). Output: array<bigint> of length
  * `numHashes`.
  *
  * Shingling happens inside the expression (combined hash of consecutive
  * token hashes) — shingle strings are never materialized.
  */
case class MinHashSignature(child: Expression, numHashes: Int, shingleSize: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val coeffs: Array[(Long, Long)] =
    Array.tabulate(numHashes) { i =>
      (TextHashing.mix(seed + 2L * i) | 1L, TextHashing.mix(seed + 2L * i + 1))
    }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${CodeGenerator.javaType(dataType)}) $ref.compute($c);")
  }

  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    if (n >= shingleSize) {
      val tokenHashes = new Array[Long](n)
      var i = 0
      while (i < n) {
        tokenHashes(i) = TextHashing.hashUtf8(tokens.getUTF8String(i))
        i += 1
      }
      var s = 0
      while (s <= n - shingleSize) {
        var base = 0L
        var j = 0
        while (j < shingleSize) {
          base = TextHashing.mix(base ^ tokenHashes(s + j))
          j += 1
        }
        var h = 0
        while (h < numHashes) {
          val (a, b) = coeffs(h)
          val hv = a * base + b
          if (hv < mins(h)) mins(h) = hv
          h += 1
        }
        s += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash of a token array: per-bit voting over token hashes.
  * Near-duplicate docs land within a small Hamming distance; pair search
  * buckets on 16-bit chunks (pigeonhole: distance ≤ 3 ⇒ ≥ 1 equal chunk).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = TextHashing.hashUtf8(tokens.getUTF8String(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Polynomial rolling-hash fingerprint of a string (Rabin-style, base 257
  * mod 2^64) — an order-sensitive whole-document fingerprint that, unlike
  * md5, can be computed incrementally over a stream of chunks.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollhash", this, classOf[RollingHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 257L + (bytes(i) & 0xffL); i += 1 }
    TextHashing.mix(h)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextFunctions {
  def minhashSignature(tokens: Column, numHashes: Int = 64, shingleSize: Int = 3, seed: Long = 42L): Column =
    colOf(MinHashSignature(exprOf(tokens), numHashes, shingleSize, seed))
  def simhash64(tokens: Column): Column = colOf(SimHash64(exprOf(tokens)))
  def rollingHash(text: Column): Column = colOf(RollingHash(exprOf(text)))
}
