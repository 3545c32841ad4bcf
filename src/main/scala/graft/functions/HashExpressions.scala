package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the content-hashing hot paths.
  *
  * The composable `transform`/`aggregate` formulations of these operators
  * are correct but run as interpreted higher-order functions with per-gram
  * string allocation — rolling a k-gram window via `substr` is O(n²) per
  * document (each UTF8String substring re-scans for char offsets), which
  * measured 1266 s for 5000 docs at sf0.1. These expressions do one tight
  * byte-level pass per document (O(n)), the idiomatic escape hatch when
  * built-ins can't express the access pattern efficiently
  * (SURVEY.md §4.3).
  *
  * All hashing is deterministic with fixed constants — no RNG, stable
  * across runs, JVMs and cluster topologies.
  */
object HashOps {

  /** Murmur3 64-bit finalizer — avalanches a raw rolling hash. */
  @inline def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** 64-bit hash of UTF-8 bytes (FNV-1a core + fmix64 finalizer). */
  def hashBytes(bytes: Array[Byte], from: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    val end = from + len
    while (i < end) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    fmix64(h)
  }

  /** Sliding-window minima (window w) over a gram-hash sequence via a
    * monotonic deque — O(m) total — deduped and sorted: the winnowing
    * selection step shared by every fingerprint profile.
    */
  def winnowGrams(grams: Array[Long], w: Int): Array[Long] = {
    val m = grams.length
    if (m == 0) return Array.emptyLongArray
    val ww = math.min(w, m)
    val out = new java.util.TreeSet[java.lang.Long]()
    // monotonic deque of indices with increasing gram values
    val deque = new Array[Int](m)
    var head = 0; var tail = 0
    var i = 0
    while (i < m) {
      while (tail > head && grams(deque(tail - 1)) >= grams(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - ww) head += 1
      if (i >= ww - 1) out.add(grams(deque(head)))
      i += 1
    }
    val res = new Array[Long](out.size())
    val it = out.iterator(); i = 0
    while (it.hasNext) { res(i) = it.next(); i += 1 }
    res
  }

  /** Winnowing fingerprints (MOSS scheme) of a document: rolling
    * polynomial hash of every k-byte gram, then the minimum of each
    * sliding window of w grams (monotonic-deque, O(n) total), deduped and
    * sorted. Empty result for texts shorter than k bytes.
    */
  def winnow(bytes: Array[Byte], k: Int, w: Int): Array[Long] = {
    val n = bytes.length
    if (n < k) return Array.emptyLongArray
    val B = 1000003L
    var bk = 1L // B^(k-1)
    var i = 1
    while (i < k) { bk *= B; i += 1 }
    val m = n - k + 1
    val grams = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    grams(0) = fmix64(h)
    i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xffL) * bk) * B + (bytes(i + k - 1) & 0xffL)
      grams(i) = fmix64(h)
      i += 1
    }
    winnowGrams(grams, w)
  }

  private val Golden = 0x9E3779B97F4A7C15L

  /** Hash every UTF8String element of an array. */
  def elementHashes(arr: ArrayData): Array[Long] = {
    val out = new Array[Long](arr.numElements())
    var i = 0
    while (i < out.length) {
      val b = arr.getUTF8String(i).getBytes
      out(i) = hashBytes(b, 0, b.length)
      i += 1
    }
    out
  }

  /** Positional n-gram hashes over a token-hash sequence (polynomial
    * combine + fmix64) — the hash-space analogue of string shingles,
    * without building shingle strings. O(m·n).
    *
    * `degenerateShort`: for 0 < tokens < n, emit one whole-text shingle
    * (right for MinHash — short docs still get a signature) vs an empty
    * set (right for exact Jaccard — the SQL-portable definition
    * `generate_series(1, m-n+1)` yields no shingles, and q21's oracle
    * encodes exactly that).
    */
  def ngramHashes(tokHashes: Array[Long], n: Int,
                  degenerateShort: Boolean = true): Array[Long] = {
    val m = tokHashes.length
    if (m == 0) return Array.emptyLongArray
    if (m < n) {
      if (!degenerateShort) return Array.emptyLongArray
      var acc = 0x811c9dc5L
      var j = 0
      while (j < m) { acc = acc * 1000003L + tokHashes(j); j += 1 }
      return Array(fmix64(acc))
    }
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      var acc = 0x811c9dc5L
      var j = 0
      while (j < n) { acc = acc * 1000003L + tokHashes(i + j); j += 1 }
      out(i) = fmix64(acc)
      i += 1
    }
    out
  }

  /** Distinct + sorted (set semantics for Jaccard arithmetic). */
  def distinctSorted(xs: Array[Long]): Array[Long] = {
    if (xs.length <= 1) return xs
    val sorted = xs.clone()
    java.util.Arrays.sort(sorted)
    var w = 1
    var i = 1
    while (i < sorted.length) {
      if (sorted(i) != sorted(w - 1)) { sorted(w) = sorted(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(sorted, w)
  }

  /** MinHash signature: hash each element once, derive the `numHashes`
    * per-seed values by cheap avalanche mixing, keep running minima —
    * O(elements × numHashes) long ops, no per-seed string re-hash.
    */
  def minhash(base: Array[Long], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < base.length) {
      val b = base(i)
      var s = 0
      while (s < numHashes) {
        val h = fmix64(b ^ (Golden * (s + 1)))
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      i += 1
    }
    sig
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 64-bit token hash an external engine can recompute: the first 8 bytes
    * of MD5(token-utf8), big-endian (in SQL:
    * `CAST('0x' || substr(md5(tok), 1, 16) AS UBIGINT)`). Slower than
    * [[hashBytes]] — use only where cross-engine verifiability matters.
    */
  def md5Hash64(bytes: Array[Byte]): Long =
    md5Hash64Range(bytes, 0, bytes.length)

  /** [[md5Hash64]] over a byte range, without copying. */
  def md5Hash64Range(bytes: Array[Byte], from: Int, len: Int): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(bytes, from, len)
    val d = md.digest()
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** Winnowing fingerprints over character k-grams with MD5-derived gram
    * hashes, truncated to 60 bits (first 15 hex chars) so the value is
    * non-negative — min-comparisons then agree between a signed-long
    * engine and an unsigned-SQL oracle (`CAST('0x' || substr(md5(gram),
    * 1, 15) AS BIGINT)`). Grams are CHARACTER grams (code points), the
    * unit SQL `substr` slices by; for ASCII text that equals the byte
    * gram. Oracle-checkable profile of [[winnow]].
    */
  def winnowMd5(s: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int): Array[Long] = {
    val bytes = s.getBytes
    val grams: Array[Long] =
      if (bytes.length == s.numChars()) { // ASCII: char grams == byte grams
        val m = bytes.length - k + 1
        if (m <= 0) return Array.emptyLongArray
        val g = new Array[Long](m)
        var i = 0
        while (i < m) { g(i) = md5Hash64Range(bytes, i, k) >>> 4; i += 1 }
        g
      } else {
        val str = s.toString
        val m = str.codePointCount(0, str.length) - k + 1
        if (m <= 0) return Array.emptyLongArray
        val g = new Array[Long](m)
        var start = 0 // UTF-16 offset of code point i
        var i = 0
        while (i < m) {
          val end = str.offsetByCodePoints(start, k)
          g(i) = md5Hash64(str.substring(start, end)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)) >>> 4
          start = str.offsetByCodePoints(start, 1)
          i += 1
        }
        g
      }
    winnowGrams(grams, w)
  }

  /** MD5-derived hashes of every UTF8String element of an array. */
  def elementMd5Hashes(arr: ArrayData): Array[Long] = {
    val out = new Array[Long](arr.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = md5Hash64(arr.getUTF8String(i).getBytes)
      i += 1
    }
    out
  }

  /** SimHash: per-element ±1 bit votes from the element hash. */
  def simhash(base: Array[Long]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < base.length) {
      val h = base(i)
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
}

/** `winnow_fingerprints(text, k, w)` → array<bigint> of winnowed rolling-
  * hash fingerprints (see [[HashOps.winnow]]).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    NativeKernels.winnow(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NativeKernels.winnow($c, $k, $w);")
  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

/** `minhash_signature(tokens, numHashes)` → array<bigint>: MinHash over an
  * array<string> element set.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    NativeKernels.minhashShingles(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NativeKernels.minhashShingles($c, $numHashes);")
  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** `simhash64(tokens)` → bigint SimHash fingerprint of an array<string>
  * token multiset.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(NativeKernels.simhashTokens(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NativeKernels.simhashTokens($c);")
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** `winnow_fingerprints_md5(text, k, w)` → array<bigint> winnowing
  * fingerprints over MD5-derived 60-bit character-gram hashes — the
  * oracle-checkable profile of [[WinnowFingerprints]] (see
  * [[HashOps.winnowMd5]]).
  */
case class WinnowFingerprintsMd5(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    NativeKernels.winnowMd5(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NativeKernels.winnowMd5($c, $k, $w);")
  override protected def withNewChildInternal(c: Expression): WinnowFingerprintsMd5 =
    copy(child = c)
}

/** `simhash64_md5(tokens)` → bigint SimHash whose token hashes are
  * MD5-derived ([[HashOps.md5Hash64]]) — bit-for-bit recomputable by any
  * engine with an md5() function, which makes the fingerprint
  * oracle-checkable (vs [[SimHash64]]'s faster engine-local FNV/fmix
  * family). Same voting scheme, same Hamming-distance semantics.
  */
case class SimHash64Md5(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(NativeKernels.simhashMd5Tokens(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NativeKernels.simhashMd5Tokens($c);")
  override protected def withNewChildInternal(c: Expression): SimHash64Md5 =
    copy(child = c)
}

/** `ngram_hashes(tokens, n)` → array<bigint>: DISTINCT sorted hashes of
  * positional word n-grams — the set the inverted shingle index explodes
  * (no shingle-string construction).
  */
case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    NativeKernels.ngramHashesDistinct(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NativeKernels.ngramHashesDistinct($c, $n);")
  override protected def withNewChildInternal(c: Expression): NgramHashes =
    copy(child = c)
}

/** `ngram_hashes_all(tokens, n)` → array<bigint>: hashes of positional
  * word n-grams WITH multiplicity, in document order — for counting
  * (repetition/boilerplate stats), where [[NgramHashes]]' set semantics
  * would erase exactly the signal being measured. Fewer than n tokens →
  * empty (no degenerate whole-doc gram: a count of 1 over a non-window
  * would skew ratios).
  */
case class NgramHashesAll(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    NativeKernels.ngramHashesAll(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NativeKernels.ngramHashesAll($c, $n);")
  override protected def withNewChildInternal(c: Expression): NgramHashesAll =
    copy(child = c)
}

/** `minhash_tokens(tokens, shingleN, numHashes)` → array<bigint>: MinHash
  * signature straight from the token array (token hash → n-gram rolling
  * hash → per-seed minima) in one pass; no intermediate shingle arrays.
  */
case class MinHashTokens(child: Expression, shingleN: Int, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    NativeKernels.minhashTokens(input.asInstanceOf[ArrayData], shingleN, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NativeKernels.minhashTokens($c, $shingleN, $numHashes);")
  override protected def withNewChildInternal(c: Expression): MinHashTokens =
    copy(child = c)
}

/** `dot_ff(a, b)` → double dot product of two array<float> embeddings,
  * accumulated in double in one primitive loop — the hot inner op of
  * similarity search (SURVEY.md §4.3's planned CosineSimilarity codegen
  * path; the interpreted `zip_with`+`aggregate` form measured ~10× slower
  * at sf0.1).
  */
case class DotProductFF(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(NativeKernels.dotFF(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.NativeKernels.dotFF($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : DotProductFF = copy(left = l, right = r)
}

/** `quantize8(vec)` → array<tinyint>: symmetric per-vector int8
  * quantization of an array<float> embedding (max-abs scale, floor(·+0.5)
  * rounding — see [[NativeKernels.quantize8]] for the bit-reproducibility
  * contract and the scale-cancellation property that makes cosine over
  * quantized vectors integer-only).
  */
case class Quantize8(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    NativeKernels.quantize8(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NativeKernels.quantize8($c);")
  override protected def withNewChildInternal(c: Expression): Quantize8 =
    copy(child = c)
}

/** `dot_i8(a, b)` → bigint: exact integer dot product of two
  * array<tinyint> quantized embeddings — the quantized hot loop pairing
  * [[Quantize8]], 4× less data per row than [[DotProductFF]]'s input.
  */
case class DotProductII(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(NativeKernels.dotII(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.NativeKernels.dotII($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : DotProductII = copy(left = l, right = r)
}

/** `hyperplane_sig(vec, bits)` → bigint: random-hyperplane LSH signature
  * of an array<float> embedding. Plane components are deterministic
  * pseudo-randoms derived from (plane, dim) via fmix64, folded to [-1, 1] —
  * same family as the Column-level formulation but computed in one loop.
  */
case class HyperplaneSignature(child: Expression, bits: Int, seed: Long = 0L)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      NativeKernels.hyperplaneSig(input.asInstanceOf[ArrayData], bits, seed))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NativeKernels.hyperplaneSig($c, $bits, ${seed}L);")
  override protected def withNewChildInternal(c: Expression): HyperplaneSignature =
    copy(child = c)
}

/** Column-API wrappers. */
object HashFunctions {
  def hyperplaneSignature(vec: Column, bits: Int, seed: Long = 0L): Column =
    GraftInternal.column(HyperplaneSignature(GraftInternal.expression(vec), bits, seed))
  def dotFF(a: Column, b: Column): Column =
    GraftInternal.column(DotProductFF(GraftInternal.expression(a),
      GraftInternal.expression(b)))
  def quantize8(vec: Column): Column =
    GraftInternal.column(Quantize8(GraftInternal.expression(vec)))
  def dotII(a: Column, b: Column): Column =
    GraftInternal.column(DotProductII(GraftInternal.expression(a),
      GraftInternal.expression(b)))
  def ngramHashes(tokens: Column, n: Int): Column =
    GraftInternal.column(NgramHashes(GraftInternal.expression(tokens), n))
  def ngramHashesAll(tokens: Column, n: Int): Column =
    GraftInternal.column(NgramHashesAll(GraftInternal.expression(tokens), n))
  def minhashTokens(tokens: Column, shingleN: Int = 3, numHashes: Int = 32): Column =
    GraftInternal.column(MinHashTokens(GraftInternal.expression(tokens), shingleN, numHashes))
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    GraftInternal.column(WinnowFingerprints(GraftInternal.expression(text), k, w))
  def winnowFingerprintsMd5(text: Column, k: Int = 8, w: Int = 4): Column =
    GraftInternal.column(WinnowFingerprintsMd5(GraftInternal.expression(text), k, w))
  def minhashSignature(tokens: Column, numHashes: Int = 32): Column =
    GraftInternal.column(MinHashSignature(GraftInternal.expression(tokens), numHashes))
  def simhash64(tokens: Column): Column =
    GraftInternal.column(SimHash64(GraftInternal.expression(tokens)))
  def simhash64Md5(tokens: Column): Column =
    GraftInternal.column(SimHash64Md5(GraftInternal.expression(tokens)))
}
