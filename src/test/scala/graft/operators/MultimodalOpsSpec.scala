package graft.operators

import graft.SparkSpec

/** Semantic pins for the binary-modality dedup operators: both are
  * verified against plain-Scala references computed from the raw text
  * bytes (the stand-in payloads), independent of Spark's hash/window
  * machinery.
  */
class MultimodalOpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs: Array[(Long, String)] =
    Catalog.t(spark, sfDir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))

  test("m05 media dedup == grouping by raw payload bytes") {
    val byPayload = docs.groupBy(_._2)
    val expect = docs.map { case (id, t) =>
      val ids = byPayload(t).map(_._1)
      id -> (ids.min, ids.length.toLong, id != ids.min)
    }.toMap
    val got = Catalog.byName("m05_media_dedup").build(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got === expect)
  }

  test("m06 frame near-dup == plain-Scala shared-frame counting") {
    // the m03 frame grid: up to 8 frames of 16 bytes at stride 32, only
    // for payloads >= 64 bytes
    def frames(t: String): Set[String] = {
      if (t.length < 64) Set.empty
      else (0 to math.min((t.length - 1) / 32, 7))
        .map(i => t.slice(i * 32, i * 32 + 16)).toSet
    }
    val fr = docs.map { case (id, t) => id -> frames(t) }.filter(_._2.nonEmpty)
    val expect = (for {
      (da, fa) <- fr; (db, fb) <- fr if da < db
      shared = fa.intersect(fb).size if shared >= 4
    } yield (da, db) -> shared.toLong).toMap
    val got = Catalog.byName("m06_frame_neardup").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expect)
    assert(got.nonEmpty, "fixture has no frame-overlap pairs — spec exercises nothing")
  }

  test("m07: scene counts match a driver recompute of the bucketed intensity walk") {
    val out = Catalog.byName("m07_scene_cuts").build(spark, sfDir).collect()
    val docs = Catalog.t(spark, sfDir, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).filter(_._2.length >= 64)
    assert(out.length == docs.length)
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.foreach { case (id, t) =>
      val nFrames = math.min((t.length - 1) / 32, 7) + 1
      val bkts = (0 until nFrames).map { i =>
        // the tail frame may run past the payload: both engines' substring
        // truncates (missing chars contribute 0 to the intensity sum)
        t.substring(i * 32, math.min(i * 32 + 16, t.length)).map(_.toInt).sum / 128
      }
      val cuts = bkts.sliding(2).count { case Seq(a, b) => a != b; case _ => false }
      val r = byId(id)
      assert(r.getAs[Long]("n_frames") == nFrames.toLong, s"doc $id frame count")
      assert(r.getAs[Long]("n_cuts") == cuts.toLong, s"doc $id cut count")
      assert(r.getAs[Long]("n_scenes") == cuts.toLong + 1)
    }
    // the bucketing must spread: at least 3 distinct cut counts on the fixture
    assert(out.map(_.getAs[Long]("n_cuts")).distinct.length >= 3,
      "scene-cut signal degenerated to a constant")
  }

  test("corpus precondition: documents are pure ASCII (byte == char semantics)") {
    // m02's intensity oracle and m08's chunk oracle index CHARACTERS in
    // DuckDB while the engine processes UTF-8 BYTES — equal only while
    // octet_length == length corpus-wide. This pins the stub-codec
    // precondition loudly: a regenerated fixture with one multi-byte
    // character fails HERE, not as a silent oracle divergence.
    import org.apache.spark.sql.functions._
    val nonAscii = Catalog.t(spark, sfDir, "documents")
      .where(octet_length(col("text")) =!= length(col("text"))).count()
    assert(nonAscii == 0, s"$nonAscii non-ASCII documents — m02/m08 oracles assume byte==char")
  }

  test("m08: chunk plan tiles every payload exactly (offsets, clipping, checksums)") {
    import MultimodalOps.StubAudioCodec.{Hop, Win}
    val docs = Catalog.t(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val out = Catalog.byName("m08_audio_chunks").build(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("off"),
        r.getAs[Int]("chunk_len"), r.getAs[Long]("byte_sum")))
    val byDoc = out.groupBy(_._1)
    docs.foreach { case (id, t) =>
      val n = t.length
      if (n == 0) assert(!byDoc.contains(id))
      else {
        val chunks = byDoc(id).sortBy(_._2)
        // offsets are the exact hop progression; lengths clip at the tail
        assert(chunks.map(_._2).toSeq == (0L until n.toLong by Hop.toLong).toSeq, s"doc $id offsets")
        chunks.foreach { case (_, off, len, sum) =>
          assert(len == math.min(Win, n - off.toInt), s"doc $id off $off length")
          assert(sum == t.substring(off.toInt, off.toInt + len).map(_.toInt).sum.toLong,
            s"doc $id off $off checksum")
        }
        // windows overlap by Win − Hop: interior coverage is complete
        assert(chunks.last._2 + chunks.last._3 == n, s"doc $id tail coverage")
      }
    }
    // the fixture must exercise both clipped tails and multi-chunk docs
    assert(out.exists(_._3 < Win) && byDoc.values.exists(_.length > 1))
  }

  test("m09: phash signature + banded top-20 == driver recompute; banding never misses a candidate") {
    val docs = Catalog.t(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).filter(_._2.length >= 64)
    def bands(t: String): Vector[Long] = {
      val n = t.length.toLong
      val px = (0 until 64).map(r => t.charAt((r * n / 64).toInt).toInt.toLong)
      val tot = px.sum
      (0 until 4).map { b =>
        (15 to 0 by -1).foldLeft(0L)((acc, j) =>
          acc * 2 + (if (px(b * 16 + j) * 64 > tot) 1L else 0L))
      }.toVector
    }
    val sig = docs.map { case (id, t) => id -> bands(t) }.toMap
    val cand = for {
      (a, ba) <- sig.toSeq; (b, bb) <- sig.toSeq
      if a < b && (0 until 4).exists(i => ba(i) == bb(i))
    } yield (a, b)
    def ham(a: Long, b: Long): Int = (0 until 4).map(i =>
      java.lang.Long.bitCount(sig(a)(i) ^ sig(b)(i))).sum
    val expTop = cand.map { case (a, b) => (ham(a, b), a, b) }.sorted.take(20)
      .map { case (h, a, b) => (a, b, h) }
    val out = Catalog.byName("m09_phash_neardup").build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == expTop, s"m09 top-20 != driver recompute")
    // the exact-dup guarantee behind the banding: identical payloads have
    // identical signatures, so every exact text dup IS a candidate at
    // hamming 0 (they share all four bands)
    val dupPairs = docs.groupBy(_._2).values.filter(_.length > 1)
    dupPairs.foreach { g =>
      val ids = g.map(_._1).sorted
      assert(bands(g.head._2) == sig(ids.head) && ham(ids.head, ids.last) == 0)
    }
  }
}
