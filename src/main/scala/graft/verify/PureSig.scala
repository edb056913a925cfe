package graft.verify

import java.nio.charset.StandardCharsets

/** Driver-side, pure-Scala reimplementation of the signature math used by
  * the dedup/ANN kernels (`graft.functions.TextKernels` / `VectorKernels`) —
  * deliberately INDEPENDENT of Spark internals (no Catalyst, no
  * `UTF8String`, no Spark `XXH64`): the xxHash64 below is written from the
  * public xxHash specification, and the tokenizer/shingler from the
  * documented semantics. `graft.Verify.dumpSignatures` materializes these as
  * parquet so the DuckDB oracle can hash-check the engine's LSH / SimHash /
  * hyperplane pipelines (d03/d04/d06/d07/d08, sim02) against ground truth
  * computed entirely outside the engine under test.
  *
  * Equivalence of this implementation with the engine kernels is itself
  * pinned by PureSigSpec (property-tested per function), so a regression in
  * EITHER side surfaces both in the spec suite and in the oracle gate.
  */
object PureSig {

  // ---- xxHash64 (public spec, little-endian) ----
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  private def readLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) |
      ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24) |
      ((b(i + 4) & 0xFFL) << 32) |
      ((b(i + 5) & 0xFFL) << 40) |
      ((b(i + 6) & 0xFFL) << 48) |
      ((b(i + 7) & 0xFFL) << 56)

  private def readIntUnsigned(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) |
      ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24)

  def xxh64(data: Array[Byte], seed: Long): Long = {
    val len = data.length
    var i = 0
    var h = 0L
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (i + 32 <= len) {
        v1 = rotl(v1 + readLong(data, i) * P2, 31) * P1
        v2 = rotl(v2 + readLong(data, i + 8) * P2, 31) * P1
        v3 = rotl(v3 + readLong(data, i + 16) * P2, 31) * P1
        v4 = rotl(v4 + readLong(data, i + 24) * P2, 31) * P1
        i += 32
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = (h ^ (rotl(v1 * P2, 31) * P1)) * P1 + P4
      h = (h ^ (rotl(v2 * P2, 31) * P1)) * P1 + P4
      h = (h ^ (rotl(v3 * P2, 31) * P1)) * P1 + P4
      h = (h ^ (rotl(v4 * P2, 31) * P1)) * P1 + P4
    } else h = seed + P5
    h += len
    while (i + 8 <= len) {
      h = rotl(h ^ (rotl(readLong(data, i) * P2, 31) * P1), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h = rotl(h ^ (readIntUnsigned(data, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h = rotl(h ^ ((data(i) & 0xFFL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  def xxh64(s: String, seed: Long): Long = xxh64(s.getBytes(StandardCharsets.UTF_8), seed)

  // ---- tokenization (documented semantics: maximal runs of characters
  // outside the regex \s class [ \t\n\x0B\f\r] — NOT
  // Character.isWhitespace, which additionally matches U+001C–U+001F and
  // U+2028/U+2029 and would diverge from every regex-split mirror) ----

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def tokens(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        out += s.substring(start, i)
      }
    }
    out.toArray
  }

  /** Distinct word n-gram shingles (space-joined); < n tokens → empty. */
  def shingles(s: String, n: Int): Set[String] = {
    val t = tokens(s)
    if (t.length < n) Set.empty
    else (0 to t.length - n).map(j => t.slice(j, j + n).mkString(" ")).toSet
  }

  // ---- MinHash (same parameterization as TextKernels.minhashSignature) ----
  val MinhashPrime = 2147483647L // 2^31 - 1

  /** h_k(x) = (pmod(xxh64(x, 42), p)·(1+2k) + (1+3k)) mod p; signature =
    * element-wise min over the doc's shingles; no shingles → all-p.
    */
  def minhashSignature(text: String, shingleN: Int, numHashes: Int): Array[Long] = {
    val mins = Array.fill(numHashes)(MinhashPrime)
    shingles(text, shingleN).foreach { sh =>
      val raw = xxh64(sh, 42L)
      val h = ((raw % MinhashPrime) + MinhashPrime) % MinhashPrime
      var k = 0
      while (k < numHashes) {
        val v = (h * (1L + 2L * k) + (1L + 3L * k)) % MinhashPrime
        if (v < mins(k)) mins(k) = v
        k += 1
      }
    }
    mins
  }

  // ---- SimHash (same parameterization as TextKernels.simHash64) ----

  /** Per-token xxh64(seed), per-bit ±1 vote, bit set when vote > 0. */
  def simhash64(text: String, seed: Long = 42L): Long = {
    val votes = new Array[Int](64)
    tokens(text).foreach { tok =>
      val h = xxh64(tok, seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  // ---- random-hyperplane LSH (same construction as VectorKernels) ----

  /** splitmix64 finalizer — the deterministic Rademacher source. */
  private def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Bit k = sign of the projection of v on hyperplane k whose components
    * are ±1 from splitmix64(splitmix64(k) ^ i).
    */
  def hyperplaneBucket(v: Array[Float], numPlanes: Int): Long = {
    var bucket = 0L
    var k = 0
    while (k < numPlanes) {
      var proj = 0.0
      var i = 0
      while (i < v.length) {
        val sign = if ((mix64(mix64(k.toLong) ^ i.toLong) & 1L) == 0L) 1.0 else -1.0
        proj += v(i).toDouble * sign
        i += 1
      }
      if (proj >= 0) bucket |= (1L << k)
      k += 1
    }
    bucket
  }
}
