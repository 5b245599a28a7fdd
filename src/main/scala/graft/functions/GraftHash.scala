package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side helper for the native MinHash expression ([[Native.minhashSigs]]).
  *
  * Computes, in ONE pass over the document text, the per-seed minimum of
  * `md5('s' || seed || window)` over all character 8-gram windows — the exact
  * semantics of the SQL expression it replaces
  * (`array_min(transform(sequence(1, greatest(length(text)-7, 1)), i ->
  * md5(concat('s<k>', substr(text, i, 8)))))`, queries/Dedup.scala) — but
  * without materializing a per-row position array, per-window hex strings, or
  * per-seed passes. Digests are compared as unsigned byte arrays; hex encoding
  * is order-preserving per nibble ('0'-'9' < 'a'-'f'), so the byte-level min
  * IS the hex-string min and only the winners are hex-encoded.
  *
  * At 100 TB the MinHash scan is corpus-bound (every byte of every document is
  * hashed nSeeds times); cutting its constant factor cuts the whole dedup
  * stage's cost, and the single-pass shape keeps the per-row allocation count
  * independent of document length.
  */
object GraftHash {

  private val HexChars = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      val b = d(i) & 0xff
      out(2 * i) = HexChars(b >>> 4)
      out(2 * i + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  // Byte-level split on ' ' (0x20): identical to Spark's split(text, ' ')
  // with limit -1 — keeps empty tokens between consecutive separators AND
  // trailing empties; 0x20 never occurs inside a multi-byte UTF-8 sequence,
  // so byte split == character split. Calls f(bytes, offset, length) per
  // token.
  private def foreachToken(text: UTF8String)(f: (Array[Byte], Int, Int) => Unit): Unit = {
    val bytes = text.getBytes
    var start = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { f(bytes, start, i - start); start = i + 1 }
      i += 1
    }
    f(bytes, start, bytes.length - start)
  }

  /** 16-bit SimHash over the token multiset — one pass, no explode/shuffle.
    * Exact semantics of d03's SQL form: per token, h16 = first 4 hex nibbles
    * of md5(token) (= first two digest bytes big-endian); each of the 16 bits
    * votes +1 when set, -1 when clear, summed over ALL token occurrences;
    * output bit b is set iff its vote total is > 0.
    */
  def simhash16(text: UTF8String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val votes = new Array[Int](16)
    foreachToken(text) { (b, off, len) =>
      md.reset()
      md.update(b, off, len)
      val d = md.digest()
      val h16 = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      var bit = 0
      while (bit < 16) {
        votes(bit) += (if (((h16 >> bit) & 1) == 1) 1 else -1)
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 16) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** Hashing-trick token-count vector (d06's feature map) — one pass, no
    * explode/groupBy shuffle. Exact semantics of the SQL form: per token,
    * j = (first two hex nibbles of md5(token) as an int) % dim (= first
    * digest byte % dim); counts accumulate per slot; missing slots are 0.
    */
  def tokenCountVec(text: UTF8String, dim: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val counts = new Array[Long](dim)
    foreachToken(text) { (b, off, len) =>
      md.reset()
      md.update(b, off, len)
      counts((md.digest()(0) & 0xff) % dim) += 1L
    }
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) { out(i) = counts(i); i += 1 }
    new GenericArrayData(out)
  }

  // d06 hyperplane signs, precomputed once per JVM for the max layout
  // (4 bands × 16 planes × 64 dims = 4096 md5 calls): sgn(band, p, j) = +1
  // when the first hex nibble of md5("eb<band>_<p>_<j>") is even, else -1 —
  // the exact integer rule of d06's SQL `planes` CTE.
  private val MaxBands = 4
  private val MaxPlanes = 16
  private val MaxDim = 64
  private lazy val planeSigns: Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Byte](MaxBands * MaxPlanes * MaxDim)
    var band = 0
    while (band < MaxBands) {
      var p = 0
      while (p < MaxPlanes) {
        var j = 0
        while (j < MaxDim) {
          md.reset()
          md.update(s"eb${band}_${p}_$j".getBytes("UTF-8"))
          val nib = (md.digest()(0) & 0xff) >>> 4
          out((band * MaxPlanes + p) * MaxDim + j) =
            if (nib % 2 == 0) 1 else -1
          j += 1
        }
        p += 1
      }
      band += 1
    }
    out
  }

  /** Signed-hyperplane LSH bucket per band over a dense count vector — the
    * d06 `planes`-join + double-groupBy collapsed to one in-row computation
    * (all-integer, hence engine-exact): proj(band, p) = Σ_j sgn(band,p,j)·v_j;
    * bucket bit p is set iff proj > 0. Returns array(bucket_band0, ...).
    */
  def embBuckets(v: ArrayData, nBands: Int, nPlanes: Int): ArrayData = {
    require(nBands <= MaxBands && nPlanes <= MaxPlanes,
      s"embBuckets supports up to $MaxBands bands x $MaxPlanes planes")
    val dim = math.min(v.numElements(), MaxDim)
    val vec = new Array[Long](dim)
    var j = 0
    while (j < dim) { vec(j) = v.getLong(j); j += 1 }
    val out = new Array[Any](nBands)
    var band = 0
    while (band < nBands) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val base = (band * MaxPlanes + p) * MaxDim
        var proj = 0L
        j = 0
        while (j < dim) { proj += planeSigns(base + j) * vec(j); j += 1 }
        if (proj > 0) bucket |= (1L << p)
        p += 1
      }
      out(band) = bucket
      band += 1
    }
    new GenericArrayData(out)
  }

  /** Per-seed minimum MD5 (lowercase hex) over all character 8-gram windows.
    * Window semantics mirror SQL `substr(text, i, 8)` for i in
    * 1..greatest(numChars-7, 1): windows shorter than 8 occur only when the
    * whole text is shorter than 8 (then the single window is the whole text,
    * possibly empty). Returns array(mh0, ..., mh{nSeeds-1}).
    */
  def minhashSigs(text: UTF8String, nSeeds: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val nChars = text.numChars()
    val nWins = math.max(nChars - 7, 1)
    val bytes = text.getBytes
    val ascii = bytes.length == nChars
    val prefixes = new Array[Array[Byte]](nSeeds)
    var k = 0
    while (k < nSeeds) { prefixes(k) = ("s" + k).getBytes("UTF-8"); k += 1 }
    val best = new Array[Array[Byte]](nSeeds)
    var i = 0
    while (i < nWins) {
      // one window slice per position, shared by all seeds
      val (wb, off, len) =
        if (ascii) (bytes, i, math.min(8, nChars - i))
        else {
          val w = text.substringSQL(i + 1, 8).getBytes
          (w, 0, w.length)
        }
      k = 0
      while (k < nSeeds) {
        md.reset()
        md.update(prefixes(k))
        md.update(wb, off, len)
        val dig = md.digest()
        if (best(k) == null || java.util.Arrays.compareUnsigned(dig, best(k)) < 0)
          best(k) = dig
        k += 1
      }
      i += 1
    }
    val out = new Array[Any](nSeeds)
    k = 0
    while (k < nSeeds) { out(k) = UTF8String.fromString(toHex(best(k))); k += 1 }
    new GenericArrayData(out)
  }
}
