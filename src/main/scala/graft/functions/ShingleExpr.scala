package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Imperative kernel for the k-word shingle hash set.
  *
  * The declarative formulation — `array_sort(transform(array_distinct(
  * transform(sequence(...), i -> concat_ws(' ', element_at...))),
  * xxhash64))` — is correct but runs on Catalyst's INTERPRETED
  * higher-order-function path (lambdas have no codegen), measured at
  * ~14 µs per shingle: 3.5 s just to build shingles for a 5 000-doc
  * corpus, multiplied into every dedup/decontamination consumer. This
  * kernel does the identical work in one tight JVM loop.
  *
  * Hash compatibility: each shingle hash is XXH64(seed 42) over the
  * UTF-8 bytes of the k words joined by single spaces — byte-identical
  * input to `xxhash64(concat_ws(' ', w0..wk-1))`, so the values equal
  * the old formulation's and every downstream recall/threshold is
  * unchanged. Output is sorted and de-duplicated (the canonical order
  * prefix filtering needs); dedup happens on hashes rather than strings,
  * equivalent up to 64-bit collisions (the same negligible-collision
  * argument the consumers already make).
  */
object ShingleUtil {
  def hashes(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val words = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      words(i) = if (w eq null) UTF8String.EMPTY_UTF8 else w
      i += 1
    }
    val m = n - k + 1
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var len = k - 1 // separator spaces
      var j = 0
      while (j < k) { len += words(i + j).numBytes; j += 1 }
      val buf = new Array[Byte](len)
      var off = Platform.BYTE_ARRAY_OFFSET
      j = 0
      while (j < k) {
        if (j > 0) { Platform.putByte(buf, off, ' '.toByte); off += 1 }
        val w = words(i + j)
        w.writeToMemory(buf, off)
        off += w.numBytes
        j += 1
      }
      out(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    // compact consecutive duplicates in place
    var w = 0
    i = 0
    while (i < m) {
      if (i == 0 || out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == m) out else java.util.Arrays.copyOf(out, w))
  }
}

/** Codegen'd wrapper: shingle_hash_set(tokens, k) → sorted distinct
  * array<long>. Stays inside whole-stage codegen via a single static
  * call — no lambda interpretation, no per-row boxing. */
case class ShingleHashSet(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash_set requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.hashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleUtil.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

/** Imperative kernel for the ORACLE-EXPRESSIBLE md5 MinHash signature
  * over k-word shingles (round 6 — converts dedup_near from rows-only
  * to the driver's hash-compare signal).
  *
  * Hash family: one MD5 per shingle string (k words joined by single
  * spaces, the ShingleUtil byte layout); h1/h2 = the digest's first /
  * second 8 bytes big-endian (exactly DuckDB's
  * `CAST('0x' || substr(md5(s), 1|17, 16) AS UBIGINT)`); the numHash
  * functions are Kirsch–Mitzenmacher double hashing
  * h_j = (h1 + j·h2) mod p, p = 2^61 − 1 — so every value is a
  * POSITIVE 61-bit integer whose signed-BIGINT ordering equals DuckDB's
  * unsigned ordering, and the whole signature replays verbatim in SQL.
  * The reduction loop adds h2m once per j with a conditional subtract
  * (sums stay < 2p < 2^62 — no overflow), identical to the closed form
  * `(h1 % p + j·(h2 % p)) % p` the oracle computes in HUGEINT space.
  * Duplicate shingles change no minimum, so no dedup pass is needed.
  * One MD5 + one running-minima pass per shingle, single static call —
  * whole-stage codegen, no lambdas (the dedup_near 8.7 s lesson). */
object MinHashMd5Util {
  private val P = 2305843009213693951L // 2^61 - 1
  def sig(arr: ArrayData, k: Int, numHash: Int): ArrayData = {
    val n = arr.numElements()
    val out = Array.fill(numHash)(Long.MaxValue)
    if (n >= k) {
      val md = java.security.MessageDigest.getInstance("MD5")
      val words = new Array[UTF8String](n)
      var i = 0
      while (i < n) {
        val w = arr.getUTF8String(i)
        words(i) = if (w eq null) UTF8String.EMPTY_UTF8 else w
        i += 1
      }
      i = 0
      while (i <= n - k) {
        var len = k - 1
        var j = 0
        while (j < k) { len += words(i + j).numBytes; j += 1 }
        val buf = new Array[Byte](len)
        var off = Platform.BYTE_ARRAY_OFFSET
        j = 0
        while (j < k) {
          if (j > 0) { Platform.putByte(buf, off, ' '.toByte); off += 1 }
          val w = words(i + j)
          w.writeToMemory(buf, off)
          off += w.numBytes
          j += 1
        }
        val dig = md.digest(buf)
        var h1 = 0L; var h2 = 0L
        var b = 0
        while (b < 8) {
          h1 = (h1 << 8) | (dig(b) & 0xffL)
          h2 = (h2 << 8) | (dig(b + 8) & 0xffL)
          b += 1
        }
        val h2m = java.lang.Long.remainderUnsigned(h2, P)
        var m = java.lang.Long.remainderUnsigned(h1, P)
        j = 0
        while (j < numHash) {
          if (m < out(j)) out(j) = m
          m += h2m
          if (m >= P) m -= P
          j += 1
        }
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Codegen'd wrapper: min_hash_sig_md5(tokens, k, numHash) →
  * array<long> of 61-bit positive minima (see [[MinHashMd5Util]]). */
case class MinHashSigMd5(child: Expression, k: Int, numHash: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_hash_sig_md5 requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "min_hash_sig_md5"

  override protected def nullSafeEval(input: Any): Any =
    MinHashMd5Util.sig(input.asInstanceOf[ArrayData], k, numHash)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashMd5Util.sig($c, $k, $numHash)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigMd5 =
    copy(child = newChild)
}

object ShingleExprs {
  /** shingle_hash_set(tokens, k): sorted distinct XXH64 hashes of the
    * k-word shingles of `tokens` — hash-compatible with
    * `xxhash64(concat_ws(' ', ...))`. */
  def shingleHashSet(c: Column, k: Int = 3): Column =
    GraftBridge.column(ShingleHashSet(GraftBridge.expression(c), k))

  /** min_hash_sig_md5(tokens, numHash): oracle-expressible md5 MinHash
    * over k-word shingles (see [[MinHashMd5Util]]). */
  def minHashSigMd5(c: Column, numHash: Int, k: Int = 3): Column =
    GraftBridge.column(MinHashSigMd5(GraftBridge.expression(c), k, numHash))
}
