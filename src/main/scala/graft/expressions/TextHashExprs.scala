package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.{GraftShim => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HashFns

/** Single-pass JVM implementations of the shingle/MinHash hashing that
  * the composed form (transform + md5 + conv per shingle) evaluates
  * interpreted, with a string/md5 round-trip per shingle (~40µs/row ×
  * 500 shingles: the d_minhash query spent 100s at sf0.1 on it).
  *
  * The math is EXACTLY the md5-arithmetic contract of
  * HashFns/Oracles: h(shingle) = int(hex(md5(utf8 bytes))[0:15], 16)
  * % (2^31-1), then perm_i(h) = (a_i·h + b_i) % (2^31-1). The first
  * 15 hex chars of the digest are the first 8 bytes read big-endian,
  * shifted right 4 bits — computed here straight from the digest
  * bytes, no hex string. Verified hash-identical to the DuckDB oracle.
  *
  * These are per-row scalar calls with a heavy internal loop, so
  * CodegenFallback costs nothing measurable; the win is the loop
  * being JVM bytecode instead of an interpreted expression tree.
  */
object ShingleHashing {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Byte offset of each code point (plus one past the end), so shingle
    * substrings are md5'd straight from the UTF-8 bytes. Code-point
    * indexing matches Spark's substring() semantics used in the
    * composed form and DuckDB's substr().
    */
  private def codePointByteOffsets(bytes: Array[Byte]): Array[Int] = {
    val offs = new Array[Int](bytes.length + 1)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      offs(n) = i
      val b = bytes(i) & 0xff
      i += (if (b < 0x80) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4)
      n += 1
    }
    offs(n) = bytes.length
    java.util.Arrays.copyOf(offs, n + 1)
  }

  /** h ∈ [0, P31) per k-code-point shingle; empty when text shorter than k. */
  def shingleHashes(text: UTF8String, k: Int): Array[Long] = {
    val bytes = text.getBytes
    val offs = codePointByteOffsets(bytes)
    val nCp = offs.length - 1
    if (nCp < k) return Array.emptyLongArray
    val md = md5.get()
    val out = new Array[Long](nCp - k + 1)
    var p = 0
    while (p + k <= nCp) {
      md.reset()
      md.update(bytes, offs(p), offs(p + k) - offs(p))
      val d = md.digest()
      // first 15 hex chars == first 8 bytes big-endian >>> 4 (60 bits)
      val top8 =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      out(p) = (top8 >>> 4) % HashFns.P31
      p += 1
    }
    out
  }

  /** MinHash signature: for each permutation i, min over shingles of
    * (a_i·h + b_i) % P31. Null-length texts → empty signature (callers
    * filter length < k upstream, matching the composed form).
    */
  def minhashSig(text: UTF8String, k: Int): Array[Long] = {
    val hs = shingleHashes(text, k)
    if (hs.isEmpty) return Array.emptyLongArray
    val nPerm = HashFns.numPerms
    val sig = Array.fill(nPerm)(Long.MaxValue)
    var j = 0
    while (j < hs.length) {
      val h = hs(j)
      var i = 0
      while (i < nPerm) {
        val v = (HashFns.minhashA(i) * h + HashFns.minhashB(i)) % HashFns.P31
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }
}

/** array<long> of shingle hashes of a text column (see ShingleHashing). */
case class ShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    new GenericArrayData(ShingleHashing.shingleHashes(t.asInstanceOf[UTF8String], k))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** array<long> MinHash signature (numPerms entries) of a text column. */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    new GenericArrayData(ShingleHashing.minhashSig(t.asInstanceOf[UTF8String], k))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextHashExprs {
  def shingleHashes(text: Column, k: Int): Column =
    ExpressionUtils.column(ShingleHashesExpr(ExpressionUtils.expression(text), k))
  def minhashSig(text: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSigExpr(ExpressionUtils.expression(text), k))
}
