package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the text kernels not covered by PureSigSpec:
  * word_ngrams (positional, with multiplicity), token_fingerprint, and
  * word_set_counts — each against a plain-Scala reference built on the
  * documented tokenization (WS.split(trim, -1): empty string → one empty
  * token, tokens never contain whitespace).
  */
class KernelFuzzSpec extends AnyFunSuite {

  private val piece = Gen.oneOf(
    "the", "and", "données", "x", "zz9", "", " ", "  ", "\t", "\n", ".", "a-b",
    // U+001C (file separator) and U+2028 (line separator): inside regex-\s
    // tokens but Character.isWhitespace-true — the chars where a scan
    // built on isWhitespace diverges from every regex-split mirror
    "a\u001Cb", "c\u2028d",
    "the", "the") // repeats make duplicate n-grams likely
  private val textGen = Gen.listOf(piece).map(_.mkString(" "))

  private def checked(p: Prop): Unit = {
    val res = check(Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** The two tokenizations the kernels use — pinned separately because
    * they differ on tab/newline-wrapped input:
    *
    * - [[scanToks]]: wordNgrams/wordShingles scan-skip ALL whitespace and
    *   never emit an empty token (equivalent to filtering empties after a
    *   full-whitespace trim);
    * - [[sqlToks]]: splitTokens-based kernels (token_fingerprint,
    *   word_set_counts) mirror split(trim(s), '\\s+') where trim is the
    *   SQL function — it strips ONLY the space character (UTF8String.trim
    *   and DuckDB trim agree), so a tab-leading string keeps a leading
    *   empty token. Java's String.trim strips every control char
    *   <= U+0020 and is a faithful reference for NEITHER.
    */
  private def scanToks(s: String): Array[String] =
    s.split("\\s+", -1).filter(_.nonEmpty)

  private def sqlToks(s: String): Array[String] =
    s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse.split("\\s+", -1)

  private def ngrams(s: String, n: Int): Seq[String] = {
    val k = TextKernels.wordNgrams(UTF8String.fromString(s), n)
    (0 until k.numElements()).map(k.getUTF8String(_).toString)
  }

  test("word_ngrams == in-order sliding windows with multiplicity") {
    checked(Prop.forAll(textGen, Gen.oneOf(2, 3, 4, 8)) { (s, n) =>
      ngrams(s, n) == scanToks(s).sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
    })
  }

  test("word_ngrams prefix property: every 3-gram's leading bigram is a 2-gram") {
    // tokens contain no whitespace, so splitting a gram on single spaces
    // recovers its tokens exactly
    checked(Prop.forAll(textGen) { s =>
      val g2 = ngrams(s, 2).toSet
      ngrams(s, 3).forall(g => g2.contains(g.split(" ", -1).take(2).mkString(" ")))
    })
  }

  test("token_fingerprint == position-weighted reference, and is total") {
    checked(Prop.forAll(textGen) { s =>
      val got = TextKernels.tokenFingerprint(UTF8String.fromString(s))
      val ts = sqlToks(s)
      val m = 1000000007L
      val acc = ts.zipWithIndex.map { case (w, i) =>
        val head = if (w.isEmpty) 0L else w.codePointAt(0).toLong
        (head * 31 + w.length) * (i + 1L)
      }.sum
      got == ((acc % m) + m) % m && got >= 0L
    })
  }

  test("word_set_counts == per-set membership counts with multiplicity") {
    val sets = Array(
      new java.util.HashSet[String](java.util.Arrays.asList("the", "and")),
      new java.util.HashSet[String](java.util.Arrays.asList("x", "zz9", ".")))
    checked(Prop.forAll(textGen) { s =>
      val kernel = TextKernels.wordSetCounts(UTF8String.fromString(s), sets)
      val got = (0 until kernel.numElements()).map(kernel.getInt)
      val ts = sqlToks(s)
      got == sets.toSeq.map(set => ts.count(set.contains))
    })
  }

  test("scaled_l2 kernel == plain-Scala floor-sum on random finite vectors, both element types") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // embedding-magnitude finite values (the fixture contract: no NaN/Inf);
    // negatives and near-zero exercise the floor's sign behavior
    val f = Gen.chooseNum(-8.0f, 8.0f)
    val vec = Gen.listOfN(16, f).map(_.toArray)
    def ref(a: Array[Float], b: Array[Double], n: Int): Long =
      (0 until n).map { i =>
        val d = a(i).toDouble - b(i)
        math.floor(d * d * 1e15).toLong
      }.sum
    checked(Prop.forAll(vec, vec) { (a, b) =>
      val fa = new GenericArrayData(a.map(x => x: Any))
      val fb = new GenericArrayData(b.map(x => x: Any))
      val db = new GenericArrayData(b.map(x => x.toDouble: Any))
      val exp = ref(a, b.map(_.toDouble), 16)
      VectorKernels.scaledL2(fa, fb, true, true) == exp &&
        VectorKernels.scaledL2(fa, db, true, false) == exp
    })
    // unequal lengths truncate to the shorter side (the scaledDot
    // convention) — pinned so a silent fixture-dim drift fails loudly in
    // the shape guards, not here
    val a = new GenericArrayData(Array[Any](1.0f, 2.0f, 3.0f))
    val b = new GenericArrayData(Array[Any](1.5f))
    assert(VectorKernels.scaledL2(a, b, true, true) == ref(Array(1.0f), Array(1.5), 1))
  }
}
