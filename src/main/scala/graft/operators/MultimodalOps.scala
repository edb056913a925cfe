package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Catalog._

/** Multimodal-column plumbing for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, processed partition-parallel.
  *
  * The DECODE step is a deterministic stub (`StubImageCodec`) because no
  * image/audio libraries exist in this environment — clearly marked below.
  * Everything Spark-side is real and tested: the schema contract, the
  * typed-Dataset `mapPartitions` batch shape (one codec instance per
  * partition, streamed row iterator — the Scala analog of a Pandas-UDF
  * `mapInPandas` batch loop), partition parallelism, and the downstream
  * feature columns.
  */
object MultimodalOps {

  /** m09's frequent-bucket ban list: a pHash band bucket with more members
    * than this carries no near-dup signal and would expand C(n,2) pairs —
    * the quadratic blow-up banding exists to avoid. Declared before `all`
    * (the oracle string interpolates it at object init — the KnnK trap).
    */
  val PhashBucketCap = 64L

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)

  /** Decoded features: what a real image decoder would emit. */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      mean_intensity: Double)

  /** STUB — stands in for a real decoder (e.g. libjpeg via JNI or a Pandas
    * UDF with PIL). Deterministic pure function of the payload bytes so
    * tests and oracles can pin it. A real deployment swaps ONLY this object;
    * the Spark plumbing around it is unchanged.
    */
  object StubImageCodec extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Int, Double) = {
      val n = payload.length
      // fake dimensions derived from content length; fake intensity =
      // mean byte value — deterministic, engine-independent.
      val width = 16 + (n % 64)
      val height = 16 + ((n / 64) % 64)
      val channels = 3
      val mean = if (n == 0) 0.0 else payload.map(b => (b & 0xff).toLong).sum.toDouble / n
      (width, height, channels, mean)
    }
  }

  /** The media "table": documents' text bytes standing in for image payloads
    * (the container has no media fixtures). Schema shape is the real
    * contract: (id, binary payload, type tag).
    */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    t(s, d, "documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"),
        concat(lit("image/fake-"), col("lang")).as("media_type"))
      .as[MediaRow]
  }

  /** Decode + feature-extract, partition-parallel: one codec per partition,
    * rows streamed through it (never materialized per-partition) — the
    * `mapInPandas` batch pattern in typed-Dataset form. Embarrassingly
    * parallel at cluster scale; no shuffle.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = StubImageCodec // per-partition init (real codecs are costly to construct)
      rows.map { r =>
        val (w, h, c, mean) = codec.decode(r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length, w, h, c, mean)
      }
    }
  }

  val all: Seq[Q] = Seq(
    // Full multimodal pipeline: binary ingest → per-partition decode →
    // typed features → relational post-processing. The decode is the
    // documented stub; its arithmetic is reproduced in the DuckDB oracle so
    // the whole pipeline stays hash-checked.
    Q("m02_media_features",
      (s, d) => decodeFeatures(mediaTable(s, d)).toDF()
        .select("doc_id", "media_type", "n_bytes", "width", "height", "mean_intensity")
        .orderBy("doc_id"),
      // documents are pure ASCII (verified: octet_length == length for all
      // rows), so byte mean == character-code mean in the oracle.
      Some("""SELECT doc_id,
                     'image/fake-' || lang AS media_type,
                     CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                     CAST(16 + octet_length(encode(text)) % 64 AS INT) AS width,
                     CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INT) AS height,
                     CAST(list_sum(list_transform(range(1, length(text) + 1),
                            i -> ascii(text[i]))) AS DOUBLE) / length(text) AS mean_intensity
              FROM documents ORDER BY doc_id""")),

    // Frame-sampling shape: explode a payload into fixed-stride chunks
    // (what video frame extraction looks like as dataflow): pure column
    // expressions, no UDF.
    Q("m03_frame_sample",
      (s, d) => t(s, d, "documents")
        .withColumn("payload", col("text").cast(BinaryType))
        .withColumn("n", octet_length(col("payload")))
        .where(col("n") >= 64)
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0L), least(floor((col("n") - 1) / 32).cast(LongType), lit(7L))),
            i => col("payload").substr((i * 32 + 1).cast(IntegerType), lit(16)))).as(Seq("frame_idx", "frame")))
        .select(col("doc_id"), col("frame_idx"),
          sha2(col("frame"), 256).as("frame_digest"))
        .orderBy("doc_id", "frame_idx"),
      // DuckDB can't substring BLOBs; documents are pure ASCII so slicing
      // the VARCHAR hashes the same bytes.
      Some("""WITH x AS (
                SELECT doc_id, UNNEST(range(0, LEAST((length(text) - 1) // 32, 7) + 1)) AS frame_idx, text
                FROM documents WHERE length(text) >= 64)
              SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
                     sha256(substring(text, CAST(frame_idx * 32 + 1 AS INT), 16)) AS frame_digest
              FROM x ORDER BY doc_id, frame_idx""")),

    // CROSS-MODAL curation view: media features grouped by the TRAINED
    // semantic cluster of the paired embedding (embeddings are 1:1 with
    // documents by id) — the report that catches clusters whose media is
    // degenerate (tiny payloads, washed-out intensity concentrated in one
    // semantic cell). Exact arithmetic end-to-end: byte totals are integer
    // sums, intensity means ride the dec() fixed-point convention so the
    // per-cell mean is order-independent; the oracle replays k-means
    // training, the stub decode, and the aggregation in one SQL query.
    Q("m04_media_by_cluster",
      (s, d) => {
        val feats = decodeFeatures(mediaTable(s, d)).toDF()
          .select(col("doc_id"), col("n_bytes"), col("mean_intensity"))
        val cells = SimilarityOps.assignCells(
            SimilarityOps.withNorm(s, d), SimilarityOps.trainedCentroids(s, d, iters = 2))
          .select(col("vec_id").as("doc_id"), col("cell"))
        feats.join(cells, "doc_id")
          .groupBy("cell")
          .agg(count(lit(1)).as("n_media"),
            sum(col("n_bytes").cast(LongType)).as("total_bytes"),
            davg(col("mean_intensity")).as("avg_intensity"))
          .orderBy("cell")
      },
      Some(s"""WITH ${SimilarityOps.sqlTrainedAssignCtes},
                 feats AS (
                   SELECT doc_id,
                          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                          CAST(list_sum(list_transform(range(1, length(text) + 1),
                                 i -> ascii(text[i]))) AS DOUBLE) / length(text) AS mean_intensity
                   FROM documents)
               SELECT CAST(a2.cell AS INT) AS cell,
                      COUNT(*) AS n_media,
                      CAST(SUM(f.n_bytes) AS BIGINT) AS total_bytes,
                      ${sqlDavg("f.mean_intensity")} AS avg_intensity
               FROM feats f JOIN a2 ON a2.vec_id = f.doc_id
               GROUP BY 1 ORDER BY 1"""),
      bench = false),

    // MEDIA EXACT DEDUP — d01 for the binary modality: group by payload
    // digest (sha-256 of the raw bytes; media payloads are large, so the
    // shuffle keys on the 32-byte digest, never the payload), canonical =
    // lowest doc_id, emit only duplicated payloads. One hash aggregation —
    // the same shape at any corpus size.
    Q("m05_media_dedup",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("digest")
        mediaTable(s, d).toDF()
          .withColumn("digest", sha2(col("payload"), 256))
          .withColumn("canonical_id", min(col("doc_id")).over(w))
          .withColumn("n_copies", count(lit(1)).over(w))
          .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
          .select("doc_id", "canonical_id", "n_copies", "is_dup")
          .orderBy("doc_id")
      },
      // documents are pure ASCII: sha256 over the text's bytes == sha256
      // over the payload bytes
      Some("""SELECT doc_id,
                     MIN(doc_id) OVER (PARTITION BY sha256(text)) AS canonical_id,
                     COUNT(*) OVER (PARTITION BY sha256(text)) AS n_copies,
                     doc_id <> MIN(doc_id) OVER (PARTITION BY sha256(text)) AS is_dup
              FROM documents ORDER BY doc_id""")),

    // FRAME-OVERLAP NEAR-DUP — the video-near-dup shape: two media items
    // are candidate near-dups when they share >= 4 distinct frame digests
    // (m03's fixed-stride frames), regardless of position — re-encoded or
    // trimmed copies keep most frame content. The candidate join is an
    // equi-join on the digest (never the O(n²) item space); a ubiquitous
    // frame (intros, black frames) would fan out quadratically, so at
    // corpus scale a digest-df cap prunes it out of the join — d02's
    // hot-shingle move on the binary modality.
    Q("m06_frame_neardup",
      // frames are cut at CHARACTER offsets of the decoded text (and
      // hashed over their UTF-8 bytes) so engine and oracle agree on
      // every input — DuckDB cannot substring BLOBs, so a byte-offset
      // engine side would silently diverge from the VARCHAR oracle the
      // moment the fixture gained a multi-byte character; m03 keeps the
      // byte-offset binary variant with its ASCII-fixture note
      (s, d) => {
        val frames = t(s, d, "documents")
          .withColumn("n", length(col("text")))
          .where(col("n") >= 64)
          .select(col("doc_id"),
            explode(transform(
              sequence(lit(0L), least(floor((col("n") - 1) / 32).cast(LongType), lit(7L))),
              i => col("text").substr((i * 32 + 1).cast(IntegerType), lit(16)))).as("frame"))
          .select(col("doc_id"), sha2(encode(col("frame"), "UTF-8"), 256).as("digest"))
          .distinct()
        val a = frames.select(col("doc_id").as("da"), col("digest"))
        val b = frames.select(col("doc_id").as("db"), col("digest"))
        a.join(b, Seq("digest")).where(col("da") < col("db"))
          .groupBy("da", "db")
          .agg(count(lit(1)).as("n_shared"))
          .where(col("n_shared") >= 4)
          .orderBy("da", "db")
      },
      Some("""WITH x AS (
                SELECT doc_id, UNNEST(range(0, LEAST((length(text) - 1) // 32, 7) + 1)) AS frame_idx, text
                FROM documents WHERE length(text) >= 64),
              fr AS (SELECT DISTINCT doc_id,
                            sha256(substring(text, CAST(frame_idx * 32 + 1 AS INT), 16)) AS digest
                     FROM x)
              SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_shared
              FROM fr a JOIN fr b ON a.digest = b.digest AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING COUNT(*) >= 4
              ORDER BY 1, 2"""),
      bench = false),

    // SCENE-CUT DETECTION — the video-curation primitive (segment a clip
    // into shots before frame sampling): adjacent m03 frames whose COARSE
    // feature changes mark a cut. Raw digests are useless for this (every
    // adjacent fixture frame differs — verified); real detectors compare
    // quantized perceptual features, so the feature here is the frame's
    // integer intensity sum bucketed div 128 (the StubImageCodec
    // convention: ASCII payload ⇒ byte sum == char-code sum, exact on
    // both engines). The lag window is partitioned per media item — a
    // HIGH-cardinality key (the c35 shape, not the bounded-domain
    // funnel); everything else is map-only. Output per clip: frames,
    // cuts, scenes (= cuts+1) — the fixture spreads 0–7 cuts.
    Q("m07_scene_cuts",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("doc_id").orderBy("frame_idx")
        t(s, d, "documents")
          .withColumn("n", length(col("text")))
          .where(col("n") >= 64)
          .select(col("doc_id"),
            posexplode(transform(
              sequence(lit(0L), least(floor((col("n") - 1) / 32).cast(LongType), lit(7L))),
              i => col("text").substr((i * 32 + 1).cast(IntegerType), lit(16))))
              .as(Seq("frame_idx", "fr")))
          .withColumn("bkt", expr(
            "aggregate(transform(sequence(1, 16), i -> ascii(substring(fr, i, 1))), 0, (a, x) -> a + x) div 128"))
          .withColumn("pb", lag(col("bkt"), 1).over(w))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_frames"),
            count_if(col("pb").isNotNull && col("bkt") =!= col("pb")).as("n_cuts"))
          .withColumn("n_scenes", col("n_cuts") + 1)
          .orderBy("doc_id")
      },
      Some("""WITH x AS (
                SELECT doc_id, UNNEST(range(0, LEAST((length(text) - 1) // 32, 7) + 1)) AS frame_idx, text
                FROM documents WHERE length(text) >= 64),
              f AS (SELECT doc_id, frame_idx,
                           list_sum(list_transform(range(1, 17),
                             i -> ascii(substring(text, CAST(frame_idx * 32 + 1 AS INT), 16)[i]))) // 128 AS bkt
                    FROM x),
              l AS (SELECT doc_id, bkt,
                           LAG(bkt) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS pb
                    FROM f)
              SELECT doc_id, COUNT(*) AS n_frames,
                     CAST(COUNT(*) FILTER (pb IS NOT NULL AND bkt <> pb) AS BIGINT) AS n_cuts,
                     CAST(COUNT(*) FILTER (pb IS NOT NULL AND bkt <> pb) + 1 AS BIGINT) AS n_scenes
              FROM l GROUP BY doc_id ORDER BY doc_id"""),
      bench = false),

    // AUDIO WINDOWING — the fixed-length overlapping-window chunker every
    // audio featurizer (spectrogram, wav2vec-style encoder) starts from:
    // 256-byte windows at a 192-byte hop over the opaque payload, one
    // checksum feature per window via the per-partition codec (the m02
    // mapPartitions batch shape — map-only, embarrassingly parallel, no
    // shuffle until the final sort). The decode is the documented stub;
    // its arithmetic is reproduced in the oracle (ASCII payload ⇒ byte
    // sum == char-code sum) so the whole chunk plan stays hash-checked.
    Q("m08_audio_chunks",
      (s, d) => audioChunks(mediaTable(s, d)).toDF()
        .orderBy("doc_id", "off"),
      Some("""SELECT doc_id, CAST(off AS BIGINT) AS off,
                     CAST(LEAST(256, length(text) - off) AS INT) AS chunk_len,
                     CAST(list_sum(list_transform(
                            range(CAST(off + 1 AS INT),
                                  CAST(off + 1 + LEAST(256, length(text) - off) AS INT)),
                            i -> ascii(text[i]))) AS BIGINT) AS byte_sum
              FROM documents, UNNEST(range(0, GREATEST(length(text), 1), 192)) AS t(off)
              WHERE length(text) > 0
              ORDER BY doc_id, off"""),
      bench = false),

    // PERCEPTUAL-HASH NEAR-DUP — the image-near-dup primitive (aHash):
    // downscale every payload to a FIXED 64-sample grid (sample r = the
    // byte at floor(r·n/64) — resolution-independent, like resizing an
    // image to 8×8), threshold each sample against the grid mean
    // (integer cross-multiply px·64 > Σpx — engine-exact), pack the 64
    // bits into 4×16-bit bands. Retrieval is d08's banded-hamming shape
    // on the binary modality: candidates share ≥ 1 exact band value (an
    // equi-join on (band, value), never the O(n²) item space — a
    // ubiquitous band value gets the d02 df-cap at corpus scale), then
    // the 20 closest candidate pairs by full 64-bit hamming distance
    // (TakeOrdered). Exact text dups rank first at hamming 0; the
    // signature+ranking is deterministic integer math end-to-end.
    Q("m09_phash_neardup",
      (s, d) => {
        val docs = t(s, d, "documents").where(length(col("text")) >= 64)
          .select(col("doc_id"), col("text"), length(col("text")).cast(LongType).as("n"))
        // map-only signature: 64 grid samples → mean threshold → 4 Horner-
        // packed 16-bit band words (bit j of band b = sample 16b+j)
        val sig = docs
          .withColumn("px", transform(sequence(lit(0L), lit(63L)),
            r => ascii(col("text").substr(
              (floor(r * col("n") / 64) + 1).cast(IntegerType), lit(1))).cast(LongType)))
          .withColumn("tot", aggregate(col("px"), lit(0L), (a, x) => a + x))
          .withColumn("bands", transform(sequence(lit(0L), lit(3L)),
            b => aggregate(sequence(lit(15L), lit(0L), lit(-1L)), lit(0L),
              (acc, j) => acc * 2 +
                when(element_at(col("px"), (b * 16 + j + 1).cast(IntegerType)) * 64 > col("tot"),
                  lit(1L)).otherwise(lit(0L)))))
          .select(col("doc_id"), col("bands"))
          // the signature subplan feeds FIVE branches (two sides of the
          // bucket self-join, the bucket-count filter, and the ba/bb
          // hamming lookups) — without a checkpoint each branch re-runs
          // the 64-sample + band-packing expression over the whole corpus
          // (the p05 lesson; this, not the bucket join, was the measured
          // sf0.1 cost)
          .localCheckpoint()
        val bandRows = sig.select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "v")))
        // LSH ban-list discipline: a band bucket holding more than
        // [[PhashBucketCap]] members is NON-DISCRIMINATIVE (structured text
        // concentrates thresholded 16-bit words), and its C(n,2) pair
        // expansion is the quadratic blow-up banding exists to avoid —
        // measured 207 s at sf0.1 before the cap, the single worst catalog
        // entry. Dropping over-full buckets is the standard frequent-bucket
        // ban list: a true near-dup pair stays reachable through any of its
        // other, selective bands. Mirrored in the oracle.
        val bucketN = bandRows.groupBy("band", "v").agg(count(lit(1)).as("bn"))
        val kept = bandRows.join(bucketN.where(col("bn") <= PhashBucketCap),
          Seq("band", "v")).select("doc_id", "band", "v")
        val cand = kept.as("a").join(kept.as("b"),
            col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
        cand
          .join(sig.select(col("doc_id").as("da"), col("bands").as("ba")), "da")
          .join(sig.select(col("doc_id").as("db"), col("bands").as("bb")), "db")
          .withColumn("hamming", (0 until 4).map(i =>
              bit_count(element_at(col("ba"), i + 1).bitwiseXOR(element_at(col("bb"), i + 1))))
            .reduce(_ + _).cast(IntegerType))
          .select("da", "db", "hamming")
          .orderBy("hamming", "da", "db")
          .limit(20)
      },
      Some(s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents WHERE length(text) >= 64),
                s AS (SELECT doc_id, r, ascii(text[CAST((r * n) // 64 + 1 AS INT)]) AS px
                      FROM d, UNNEST(range(0, 64)) AS t(r)),
                m AS (SELECT doc_id, SUM(px) AS tot FROM s GROUP BY 1),
                b AS (SELECT s.doc_id, CAST(r // 16 AS INT) AS band,
                             CAST(SUM(CASE WHEN px * 64 > tot THEN 1 ELSE 0 END * (1 << CAST(r % 16 AS INT))) AS BIGINT) AS v
                      FROM s JOIN m USING (doc_id) GROUP BY 1, 2),
                bc AS (SELECT band, v FROM b GROUP BY band, v HAVING COUNT(*) <= $PhashBucketCap),
                bf AS (SELECT b.* FROM b JOIN bc USING (band, v)),
                cand AS (SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db
                         FROM bf a JOIN bf b2 ON a.band = b2.band AND a.v = b2.v AND a.doc_id < b2.doc_id),
                sig AS (SELECT doc_id, list(v ORDER BY band) AS bands FROM b GROUP BY 1),
                ham AS (SELECT da, db,
                               CAST(bit_count(xor(x.bands[1], y.bands[1])) + bit_count(xor(x.bands[2], y.bands[2]))
                                  + bit_count(xor(x.bands[3], y.bands[3])) + bit_count(xor(x.bands[4], y.bands[4])) AS INT) AS hamming
                        FROM cand JOIN sig x ON x.doc_id = da JOIN sig y ON y.doc_id = db)
              SELECT da, db, hamming FROM ham ORDER BY hamming, da, db LIMIT 20"""),
      bench = false)
  )

  /** One decoded audio window: offset, clipped length, stub feature. */
  final case class AudioChunk(doc_id: Long, off: Long, chunk_len: Int, byte_sum: Long)

  /** STUB audio codec (the StubImageCodec convention): deterministic
    * windows + byte-sum "feature" standing in for a real frame decoder.
    * Swap ONLY this object for a real one; the Spark plumbing holds.
    */
  object StubAudioCodec extends Serializable {
    val Win = 256
    val Hop = 192
    def chunks(docId: Long, payload: Array[Byte]): Iterator[AudioChunk] =
      if (payload.isEmpty) Iterator.empty
      else (0 until payload.length by Hop).iterator.map { off =>
        val len = math.min(Win, payload.length - off)
        var sum = 0L
        var i = off
        while (i < off + len) { sum += payload(i) & 0xff; i += 1 }
        AudioChunk(docId, off.toLong, len, sum)
      }
  }

  /** Chunk a media table partition-parallel — one codec per partition,
    * rows streamed (the [[decodeFeatures]] batch shape).
    */
  def audioChunks(media: Dataset[MediaRow]): Dataset[AudioChunk] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = StubAudioCodec
      rows.flatMap(r => codec.chunks(r.doc_id, r.payload))
    }
  }
}
