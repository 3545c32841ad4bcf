package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** ArrayData/UTF8String-level kernels shared by the native expressions'
  * interpreted `eval` AND generated code. A standalone Scala object
  * compiles with static forwarders, so Janino-generated Java calls
  * `graft.functions.NativeKernels.xxx(...)` directly — the expression
  * stays inside WholeStageCodegen with one static call per row.
  */
object NativeKernels {

  def dotFF(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  def winnow(s: UTF8String, k: Int, w: Int): ArrayData =
    new GenericArrayData(HashOps.winnow(s.getBytes, k, w))

  def winnowMd5(s: UTF8String, k: Int, w: Int): ArrayData =
    new GenericArrayData(HashOps.winnowMd5(s, k, w))

  def minhashShingles(arr: ArrayData, numHashes: Int): ArrayData =
    new GenericArrayData(HashOps.minhash(HashOps.elementHashes(arr), numHashes))

  def minhashTokens(arr: ArrayData, shingleN: Int, numHashes: Int): ArrayData =
    new GenericArrayData(HashOps.minhash(
      HashOps.ngramHashes(HashOps.elementHashes(arr), shingleN), numHashes))

  def ngramHashesDistinct(arr: ArrayData, n: Int): ArrayData =
    new GenericArrayData(
      HashOps.distinctSorted(HashOps.ngramHashes(HashOps.elementHashes(arr), n,
        degenerateShort = false)))

  def ngramHashesAll(arr: ArrayData, n: Int): ArrayData =
    new GenericArrayData(HashOps.ngramHashes(HashOps.elementHashes(arr), n,
      degenerateShort = false))

  def simhashTokens(arr: ArrayData): Long =
    HashOps.simhash(HashOps.elementHashes(arr))

  def simhashMd5Tokens(arr: ArrayData): Long =
    HashOps.simhash(HashOps.elementMd5Hashes(arr))

  def hyperplaneSig(v: ArrayData, bits: Int): Long = hyperplaneSig(v, bits, 0L)

  /** `seed` selects an independent plane family (seed 0 = the original):
    * OR-amplification unions buckets from several seeds so a near pair
    * missed by one family is caught by another.
    */
  def hyperplaneSig(v: ArrayData, bits: Int, seed: Long): Long = {
    val n = v.numElements()
    var sig = 0L
    var p = 0
    while (p < bits) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        val h = HashOps.fmix64((p.toLong + seed * bits) * 0x9E3779B97F4A7C15L + j.toLong)
        val comp = (Math.floorMod(h, 2000001L).toDouble / 1000000.0) - 1.0
        acc += v.getFloat(j).toDouble * comp
        j += 1
      }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  def textProfile(s: UTF8String): InternalRow = TextProfileKernel.profile(s)

  /** Symmetric per-vector int8 quantization of an array<float> embedding:
    * scale = max |x_i| (in double), q_i = floor(x_i·127/scale + 0.5).
    * The rounding is spelled floor(·+0.5) — NOT a library round() — so an
    * engine reproducing this in SQL gets bit-identical bytes regardless
    * of its round-half conventions; every step is double IEEE arithmetic.
    * An all-zero vector quantizes to all zeros. Values lie in [-127, 127]
    * (|x_i| <= scale bounds the scaled magnitude), so they fit a signed
    * byte with -128 never produced.
    *
    * Scale-free cosine: for vectors quantized this way,
    * cos(deq(q1), deq(q2)) = dot(q1,q2)/(|q1||q2|) — the per-vector
    * scales cancel — so similarity search over quantized vectors needs
    * only integer dot products (exact in long) and never stores the
    * scale. 4 bytes/dim becomes 1 byte/dim in parquet, shuffle, and cache.
    *
    * Non-finite components are REJECTED (IllegalArgumentException): no
    * portable bit pattern exists for quantized NaN/Infinity — a SQL
    * engine reproducing the arithmetic errors on them too — so mapping
    * them silently to 0 here would fork the bit-reproducibility
    * contract. Filter or clamp upstream.
    */
  def quantize8(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val a = Math.abs(v.getFloat(i).toDouble)
      if (!(a <= java.lang.Double.MAX_VALUE)) // NaN and ±Infinity
        throw new IllegalArgumentException(
          s"quantize8: non-finite component at index $i; filter or clamp upstream")
      if (a > s) s = a
      i += 1
    }
    val out = new Array[Byte](n)
    if (s > 0.0) {
      i = 0
      while (i < n) {
        out(i) = Math.floor(v.getFloat(i).toDouble * 127.0 / s + 0.5).toByte
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Integer dot product of two array<tinyint> quantized embeddings,
    * accumulated exactly in long (|q_i| <= 127 so 2^47 dims would be
    * needed to overflow — unreachable).
    */
  def dotII(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getByte(i).toLong * y.getByte(i).toLong; i += 1 }
    acc
  }
}
