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

/** Imperative kernel for the MinHash signature over a shingle-hash set.
  *
  * The declarative form — `array_min(transform(sh, x -> xxhash64(x, j)))`
  * × numHash columns — runs numHash interpreted lambda passes per row
  * (higher-order functions have no codegen), re-walking the shingle
  * array 12× through boxed Longs. This kernel makes ONE pass, updating
  * all numHash running minima per element with the same XXH64 primitive
  * Spark's xxhash64 uses. The signature is an internal LSH artifact
  * (banding keys only, no declared oracle), so hash-compatibility with
  * the old column formulation is not required; the planted-dup recall
  * test pins behavior.
  */
object MinHashUtil {
  def sig(arr: ArrayData, numHash: Int): ArrayData = {
    val n = arr.numElements()
    val out = Array.fill(numHash)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      var j = 0
      while (j < numHash) {
        val h = XXH64.hashLong(v, j.toLong)
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Codegen'd wrapper: min_hash_sig(shingleHashes, numHash) →
  * array<long> of length numHash. Single static call — stays inside
  * whole-stage codegen. */
case class MinHashSig(child: Expression, numHash: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_hash_sig requires array<long>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "min_hash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashUtil.sig(input.asInstanceOf[ArrayData], numHash)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashUtil.sig($c, $numHash)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object ShingleExprs {
  /** shingle_hash_set(tokens, k): sorted distinct XXH64 hashes of the
    * k-word shingles of `tokens` — hash-compatible with
    * `xxhash64(concat_ws(' ', ...))`. */
  def shingleHashSet(c: Column, k: Int = 3): Column =
    GraftBridge.column(ShingleHashSet(GraftBridge.expression(c), k))

  /** min_hash_sig(shingleHashes, numHash): one-pass MinHash signature. */
  def minHashSig(c: Column, numHash: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c), numHash))
}
