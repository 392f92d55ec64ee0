package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketch hot paths.
  *
  * Rationale (measured): Spark's higher-order functions (`transform` /
  * `aggregate`) are CodegenFallback — every lambda step is interpreted, so a
  * k=128-permutation MinHash over ~250 shingles costs ~32k interpreted
  * expression evaluations per row. These expressions do the same work in one
  * tight JVM loop per row: one xxhash64 over each element's bytes, then k
  * splitmix64-style salted mixes (plain Long arithmetic — a custom `eval` is
  * outside ANSI overflow checking, wraparound is the hash space).
  */
object HashExpressions {

  /** splitmix64 finalizer — public-domain avalanche mix. */
  @inline private[functions] def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  @inline private def hashElem(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)

  /** k-permutation MinHash signature of an array<string> set. */
  case class MinHashSig(child: Expression, k: Int, seed: Long)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sig = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = hashElem(arr.getUTF8String(i), seed)
        var p = 0
        while (p < k) {
          val hp = mix64(h ^ (seed + 0x9e3779b97f4a7c15L * (p + 1)))
          if (hp < sig(p)) sig(p) = hp
          p += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  }

  /** Banded MinHash bucket hashes: the k-perm signature computed once, then
    * each of the `bands` r-slices (r = k/bands) folded to a single bucket
    * hash. One expression evaluation per row — formulating this as
    * `transform(slice(minhash_sig(...)))` re-evaluates the whole signature
    * once per band (HOF lambda bodies are re-evaluated per element and
    * CollapseProject inlines single-use aliases). */
  case class MinHashBands(child: Expression, k: Int, bands: Int, seed: Long)
      extends UnaryExpression with CodegenFallback {
    require(k % bands == 0, "bands must divide k")
    private val r = k / bands
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sig = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = hashElem(arr.getUTF8String(i), seed)
        var p = 0
        while (p < k) {
          val hp = mix64(h ^ (seed + 0x9e3779b97f4a7c15L * (p + 1)))
          if (hp < sig(p)) sig(p) = hp
          p += 1
        }
        i += 1
      }
      val out = new Array[Any](bands)
      var b = 0
      while (b < bands) {
        var acc = seed + b
        var j = b * r
        while (j < (b + 1) * r) { acc = mix64(acc ^ sig(j)); j += 1 }
        out(b) = acc
        b += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): MinHashBands = copy(child = c)
  }

  /** 64-bit SimHash of an array<string> token multiset. */
  case class SimHash(child: Expression, seed: Long)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val h = hashElem(arr.getUTF8String(i), seed)
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
      java.lang.Long.valueOf(out)
    }
    override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
  }

  /** Distinct word n-gram shingles of a string, in one pass (split + slide +
    * dedup). Matches the declarative form exactly: tokens are `\s+` splits
    * of the trimmed text, shingles joined by single spaces, first-occurrence
    * order. */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    private val ws = "\\s+".r.pattern
    override def nullSafeEval(input: Any): Any = {
      val toks = ws.split(input.asInstanceOf[UTF8String].toString.trim)
      if (toks.length < n) return new GenericArrayData(Array.empty[Any])
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k2 = 0
      while (it.hasNext) { out(k2) = UTF8String.fromString(it.next()); k2 += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  }

  /** SimHash over an array<string> token multiset with the mod-prime
    * rolling hash as the per-token hash — weaker mixing than xxhash64 but
    * every arithmetic step is expressible in overflow-checked SQL, so the
    * whole near-dup pipeline gets a DuckDB oracle ([[SimHash]] stays the
    * fast engine-native variant). `bits` ≤ 30 (the prime's usable bits). */
  /** Largest unicode code point — the fold addend bound. Folding CODE
    * POINTS (not UTF-8 bytes) is what makes the oracle exact beyond ASCII:
    * DuckDB's `ascii(substr(s, i, 1))` yields code points and `length()`
    * counts characters, so a byte fold diverges on any non-ASCII token.
    * For pure-ASCII text the two folds are identical (and the fast path
    * below reads raw bytes). */
  private val MaxCodePoint = 0x10FFFFL

  /** `(h·mult + codePoint) % mod` over a string's code points; ASCII fast
    * path iterates the UTF-8 bytes directly (byte == code point < 0x80),
    * restarting on the first non-ASCII byte. `threshold` enables deferred
    * modular reduction (reduce only when the next multiply could
    * overflow) — pass `0` to reduce every step. */
  private def foldCodePoints(s: UTF8String, mult: Long, mod: Long,
                             threshold: Long): Long = {
    val t = if (threshold > 0) threshold else 0L
    def step(h0: Long, cp: Long): Long = {
      val h = if (t > 0) { if (h0 >= t) h0 % mod else h0 } else h0
      if (t > 0) h * mult + cp else (h * mult + cp) % mod
    }
    val nb = s.numBytes()
    var h = 0L
    var j = 0
    var ascii = true
    while (ascii && j < nb) {
      val b = s.getByte(j)
      if (b < 0) ascii = false
      else { h = step(h, b.toLong); j += 1 }
    }
    if (!ascii) {
      h = 0L
      val str = s.toString
      var k = 0
      while (k < str.length) {
        val cp = str.codePointAt(k)
        h = step(h, cp.toLong)
        k += Character.charCount(cp)
      }
    }
    h % mod
  }

  case class SimHashMod(child: Expression, bits: Int, mult: Long, mod: Long)
      extends UnaryExpression with CodegenFallback {
    require(bits > 0 && bits <= 62, "bits must be in 1..62")
    // every fold step (h·mult + codePoint) must stay below 2⁶³ — the
    // property that lets overflow-checked engines (DuckDB oracle) replay it
    require(mult > 0 && mod > 0 && mod - 1 <= (Long.MaxValue - MaxCodePoint) / mult,
      "mult·(mod-1)+maxCodePoint must fit in a signed 64-bit long")
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](bits)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val h = foldCodePoints(arr.getUTF8String(i), mult, mod, 0L)
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < bits) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      java.lang.Long.valueOf(out)
    }
    override protected def withNewChildInternal(c: Expression): SimHashMod = copy(child = c)
  }

  /** Two independent mod-prime SimHashes over the SAME token array in one
    * pass, concatenated into a `2·bits`-wide signature (low half =
    * multiplier `m1`, high half = `m2`). Equivalent to
    * `SimHashMod(m1) | SimHashMod(m2) << bits` but scans each token's
    * bytes once instead of twice — the signature stage dominates SimHash
    * dedup cost, so the fusion matters at corpus scale. */
  case class SimHashMod2(child: Expression, bits: Int, m1: Long, m2: Long, mod: Long)
      extends UnaryExpression with CodegenFallback {
    require(bits > 0 && bits <= 31, "bits must be in 1..31 (signature is 2*bits)")
    require(m1 > 0 && m2 > 0 && mod > 0 &&
      mod - 1 <= (Long.MaxValue - MaxCodePoint) / math.max(m1, m2),
      "mult*(mod-1)+maxCodePoint must fit in a signed 64-bit long")
    override def dataType: DataType = LongType
    // deferred modular reduction: (h·m + cp) need only reduce when the
    // next multiply would overflow — congruence makes the final residue
    // identical to the oracle's reduce-every-step fold, at a compare per
    // code point instead of a division
    private val t1 = (Long.MaxValue - MaxCodePoint) / m1
    private val t2 = (Long.MaxValue - MaxCodePoint) / m2
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](2 * bits)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        // fused dual fold — one scan for both halves ([[foldCodePoints]]'s
        // code-point semantics, with the same ASCII byte fast path)
        val s = arr.getUTF8String(i)
        val nb = s.numBytes()
        var h1 = 0L
        var h2 = 0L
        var j = 0
        var ascii = true
        while (ascii && j < nb) {
          val b = s.getByte(j)
          if (b < 0) ascii = false
          else {
            if (h1 >= t1) h1 %= mod
            if (h2 >= t2) h2 %= mod
            h1 = h1 * m1 + b
            h2 = h2 * m2 + b
            j += 1
          }
        }
        if (!ascii) {
          h1 = 0L; h2 = 0L
          val str = s.toString
          var k = 0
          while (k < str.length) {
            val cp = str.codePointAt(k)
            if (h1 >= t1) h1 %= mod
            if (h2 >= t2) h2 %= mod
            h1 = h1 * m1 + cp
            h2 = h2 * m2 + cp
            k += Character.charCount(cp)
          }
        }
        h1 %= mod
        h2 %= mod
        var k = 0
        while (k < bits) {
          if (((h1 >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
          if (((h2 >>> k) & 1L) == 1L) votes(bits + k) += 1 else votes(bits + k) -= 1
          k += 1
        }
        i += 1
      }
      var out = 0L
      var k = 0
      while (k < 2 * bits) { if (votes(k) > 0) out |= (1L << k); k += 1 }
      java.lang.Long.valueOf(out)
    }
    override protected def withNewChildInternal(c: Expression): SimHashMod2 = copy(child = c)
  }

  /** Polynomial rolling hash of a string's unicode code points, mod a
    * sub-2³¹ prime so every intermediate stays below 2⁶³ — the same fold
    * is expressible in overflow-checked engines (DuckDB oracle:
    * `ascii(substr(s, i, 1))` over `length(s)`), unlike wraparound
    * hashes. Identical to the former byte fold on ASCII text (fast path);
    * exact beyond it. */
  case class RollingHash(child: Expression, mult: Long, mod: Long)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        foldCodePoints(input.asInstanceOf[UTF8String], mult, mod, 0L))
    override protected def withNewChildInternal(c: Expression): RollingHash = copy(child = c)
  }

  /** Dot product of two numeric arrays in double precision — one tight JVM
    * loop with the SAME sequential left-to-right fold as the declarative
    * `aggregate(zip_with(...))` spelling (bit-identical results, so DuckDB
    * `list_sum(list_transform(...))` oracles keep matching) but without the
    * interpreted-HOF overhead: Spark's lambda HOFs are CodegenFallback, so
    * the old form paid ~2·dim interpreted expression evaluations per call. */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    private def num(a: ArrayData, et: DataType, i: Int): Double = et match {
      case FloatType => a.getFloat(i).toDouble
      case DoubleType => a.getDouble(i)
      case IntegerType => a.getInt(i).toDouble
      case LongType => a.getLong(i).toDouble
      case other => throw new IllegalArgumentException(s"VecDot: unsupported element $other")
    }
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val ae = left.dataType.asInstanceOf[ArrayType].elementType
      val be = right.dataType.asInstanceOf[ArrayType].elementType
      require(a.numElements() == b.numElements(),
        s"VecDot: dimension mismatch ${a.numElements()} vs ${b.numElements()}")
      val n = a.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        // NULL elements propagate (like the declarative fold this
        // replaced) — treating them as 0 would fabricate finite scores
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += num(a, ae, i) * num(b, be, i)
        i += 1
      }
      java.lang.Double.valueOf(acc)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
      copy(left = l, right = r)
  }

  /** Nearest-centroid id by cosine similarity against a FIXED centroid set
    * embedded in the expression (ids ascending; vectors pre-cast to double;
    * norms precomputed with the same sqrt∘fold as [[VecDot]]-based normD).
    * This is the IVF assignment step as a map-side argmax: one pass per row,
    * no join, no shuffle — the centroid set is the quantizer "model", fixed
    * K regardless of corpus size. Ties (equal cosine) keep the smallest
    * centroid id, matching `ORDER BY csc DESC, cid` in the oracle replay. */
  case class NearestCentroid(child: Expression, cids: Array[Long],
                             cents: Array[Array[Double]], cnorms: Array[Double])
      extends UnaryExpression with CodegenFallback {
    require(cids.length == cents.length && cids.length == cnorms.length && cids.nonEmpty)
    require(cids.sameElements(cids.sorted), "centroid ids must be ascending")
    override def dataType: DataType = LongType
    private def elemAt(a: ArrayData, et: DataType, i: Int): Double = et match {
      case FloatType => a.getFloat(i).toDouble
      case DoubleType => a.getDouble(i)
      case other => throw new IllegalArgumentException(s"NearestCentroid: unsupported element $other")
    }
    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val et = child.dataType.asInstanceOf[ArrayType].elementType
      val n = a.numElements()
      val v = new Array[Double](n)
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null
        v(i) = elemAt(a, et, i)
        i += 1
      }
      // ‖v‖ with the same sequential fold as normD (bit-identical scores)
      var sq = 0.0
      i = 0
      while (i < n) { sq += v(i) * v(i); i += 1 }
      val vn = math.sqrt(sq)
      var bestScore = Double.NegativeInfinity
      var bestId = cids(0)
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        require(cv.length == n, s"NearestCentroid: dimension mismatch ${cv.length} vs $n")
        var dot = 0.0
        i = 0
        while (i < n) { dot += v(i) * cv(i); i += 1 }
        val score = dot / (vn * cnorms(c))
        // strict > and ascending-cid iteration ⇒ min cid wins exact ties
        if (score > bestScore) { bestScore = score; bestId = cids(c) }
        c += 1
      }
      java.lang.Long.valueOf(bestId)
    }
    override protected def withNewChildInternal(c: Expression): NearestCentroid = copy(child = c)
  }

  /** Product-quantization encode (round 11 — replaces the interpreted
    * lambda-HOF spelling in [[graft.operators.Similarity.pqTopK]]): per
    * subspace j, the first-min argmin of the SEQUENTIAL squared-L2 fold
    * against codebook `cb(j)` (m × K × sub, a fixed driver-constant model
    * like [[NearestCentroid]]'s centroid set). Strict `<` with ascending
    * codeword iteration reproduces `array_position(dists,
    * array_min(dists))`'s first-occurrence tiebreak, and the inner fold
    * accumulates in index order — bit-identical codes to the HOF spelling
    * the DuckDB oracle replays. One tight loop per row in the scan stage:
    * no shuffle, no join, no per-element Catalyst lambda dispatch. */
  case class PqEncode(child: Expression, cb: Array[Array[Array[Double]]])
      extends UnaryExpression with CodegenFallback {
    private val m = cb.length
    private val sub = cb(0)(0).length
    require(m > 0 && cb.forall(_.forall(_.length == sub)),
      "codebook subspaces must share one dimension")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private def elemAt(a: ArrayData, et: DataType, i: Int): Double = et match {
      case FloatType => a.getFloat(i).toDouble
      case DoubleType => a.getDouble(i)
      case other => throw new IllegalArgumentException(s"PqEncode: unsupported element $other")
    }
    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val et = child.dataType.asInstanceOf[ArrayType].elementType
      require(a.numElements() == m * sub,
        s"PqEncode: dimension mismatch ${a.numElements()} vs ${m * sub}")
      val codes = new Array[Long](m)
      var j = 0
      while (j < m) {
        val words = cb(j)
        var best = Double.PositiveInfinity
        var bestC = 0
        var c = 0
        while (c < words.length) {
          val w = words(c)
          var d = 0.0
          var i = 0
          while (i < sub) {
            if (a.isNullAt(j * sub + i)) return null
            val t = elemAt(a, et, j * sub + i) - w(i)
            d += t * t
            i += 1
          }
          if (d < best) { best = d; bestC = c }
          c += 1
        }
        codes(j) = bestC.toLong
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
    }
    override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
  }

  /** PQ reconstruction: concatenate the codewords the code array names —
    * the decode half of [[PqEncode]], same fixed codebook constant. */
  case class PqReconstruct(child: Expression, cb: Array[Array[Array[Double]]])
      extends UnaryExpression with CodegenFallback {
    private val m = cb.length
    private val sub = cb(0)(0).length
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      require(a.numElements() == m,
        s"PqReconstruct: expected $m codes, got ${a.numElements()}")
      val out = new Array[Double](m * sub)
      var j = 0
      while (j < m) {
        if (a.isNullAt(j)) return null
        val w = cb(j)(a.getLong(j).toInt)
        System.arraycopy(w, 0, out, j * sub, sub)
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): PqReconstruct = copy(child = c)
  }

  private val eu = org.apache.spark.sql.GraftColumnBridge

  def wordShingles(c: Column, n: Int): Column =
    eu.column(WordShingles(eu.expression(c), n))

  def minhashSig(c: Column, k: Int, seed: Long): Column =
    eu.column(MinHashSig(eu.expression(c), k, seed))

  def minhashBands(c: Column, k: Int, bands: Int, seed: Long): Column =
    eu.column(MinHashBands(eu.expression(c), k, bands, seed))

  def simhash(c: Column, seed: Long): Column =
    eu.column(SimHash(eu.expression(c), seed))

  def rollingHash(c: Column, mult: Long = 31L, mod: Long = 1000000007L): Column =
    eu.column(RollingHash(eu.expression(c), mult, mod))

  def simhashMod(c: Column, bits: Int = 28,
                 mult: Long = 31L, mod: Long = 1073741789L): Column =
    eu.column(SimHashMod(eu.expression(c), bits, mult, mod))

  def simhashMod2(c: Column, bits: Int, m1: Long, m2: Long, mod: Long): Column =
    eu.column(SimHashMod2(eu.expression(c), bits, m1, m2, mod))

  def vecDot(a: Column, b: Column): Column =
    eu.column(VecDot(eu.expression(a), eu.expression(b)))

  def nearestCentroid(v: Column, cids: Array[Long],
                      cents: Array[Array[Double]], cnorms: Array[Double]): Column =
    eu.column(NearestCentroid(eu.expression(v), cids, cents, cnorms))

  def pqEncode(v: Column, cb: Array[Array[Array[Double]]]): Column =
    eu.column(PqEncode(eu.expression(v), cb))

  def pqReconstruct(codes: Column, cb: Array[Array[Array[Double]]]): Column =
    eu.column(PqReconstruct(eu.expression(codes), cb))
}
