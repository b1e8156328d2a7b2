package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extract / resize / frame-sample as batched per-partition
  * transforms.
  *
  * The Spark-side shape is the real thing — schema, partition-parallel
  * batched execution, typed rows — while the codec itself is a
  * deterministic STUB (`StubCodec`): the image/audio libraries are not
  * in this environment, so the stub derives fake-but-stable "decoded"
  * properties from the payload bytes. Swapping `StubCodec` for a real
  * JNI/ffmpeg/ImageIO codec changes no plumbing.
  *
  * Scale notes: payloads never shuffle — every transform is map-only
  * (`mapPartitions`), so a 100 TB media corpus streams partition by
  * partition; only the small feature rows ever reach a shuffle. Batch
  * shape (`BatchSize`) amortizes per-call overhead exactly like an
  * Arrow-batched pandas UDF would.
  */
object Multimodal {

  /** One media object: opaque payload + typed metadata. */
  case class MediaRow(id: Long, kind: String, payload: Array[Byte])

  /** "Decoded" media properties (stub: derived deterministically from
    * the bytes; real codec would parse the container).
    */
  case class MediaMeta(id: Long, kind: String, nBytes: Long,
      width: Int, height: Int, sampleRate: Int, nFrames: Int)

  /** Fixed-length feature vector per media object. */
  case class MediaFeatures(id: Long, kind: String, features: Array[Float])

  val BatchSize = 32
  val FeatureDim = 16

  /** STUB codec — deterministic fake standing in for image/audio decode.
    * Every value is a pure integer function of the payload bytes, so
    * tests are stable AND the math is spellable in the DuckDB oracle
    * (byte sum, not a wrapping hash — DuckDB BIGINT arithmetic traps on
    * overflow, so wrap-around semantics would not be reproducible
    * there).
    */
  object StubCodec {
    def decode(r: MediaRow): MediaMeta = {
      val n = r.payload.length
      var s = 0L
      r.payload.foreach(b => s += (b & 0xff))
      MediaMeta(r.id, r.kind, n.toLong,
        width = 64 + ((s + 7L * n) % 1856L).toInt,
        height = 64 + ((s / 7L + n) % 1016L).toInt,
        sampleRate = if (r.kind == "audio") 16000 else 0,
        nFrames = if (r.kind == "video") 1 + (n % 300) else 1)
    }

    /** 48-bit perceptual hash — the media analog of SimHash for the
      * binary column (blockhash/aHash family: average-compare over
      * fixed spatial blocks, here 1-D byte blocks since the stub codec
      * has no pixel grid). Bit b is set iff block b's mean byte value
      * is ≥ the whole payload's mean, compared exactly by integer
      * cross-multiplication (`s_blk · n ≥ s_tot · len_blk`) so the
      * DuckDB oracle replays it bit-identically with no float division.
      * Near-identical payloads (a real codec would feed decoded pixels
      * here) flip few block means → small hamming distance, exactly
      * the property the banded dedup join exploits.
      *
      * Empty payload hashes to 0; an empty block (payload shorter than
      * 48 bytes) contributes a 0 bit. Exact for payloads up to ~190 MB
      * (the 255·n² cross-product must stay inside a signed 64-bit —
      * far above any sane per-row media object; larger payloads should
      * hash a fixed-size resample, which is what a real pHash does
      * anyway).
      */
    def perceptualHash(payload: Array[Byte]): Long = {
      val n = payload.length
      if (n == 0) return 0L
      var total = 0L
      var i = 0
      while (i < n) { total += payload(i) & 0xff; i += 1 }
      var h = 0L
      var b = 0
      while (b < 48) {
        val lo = (b.toLong * n / 48).toInt
        val hi = ((b + 1).toLong * n / 48).toInt
        var s = 0L
        i = lo
        while (i < hi) { s += payload(i) & 0xff; i += 1 }
        if (hi > lo && s * n >= total * (hi - lo)) h |= 1L << b
        b += 1
      }
      h
    }

    /** Stub feature extraction: banded byte histogram, L1-normalized. */
    def features(r: MediaRow): Array[Float] = {
      val hist = new Array[Float](FeatureDim)
      r.payload.foreach(b => hist((b & 0xff) % FeatureDim) += 1f)
      val total = math.max(1f, r.payload.length.toFloat)
      hist.map(_ / total)
    }
  }

  /** Decode metadata for every media row, `BatchSize` rows at a time per
    * partition (the batch loop is where a real codec would amortize
    * native-call overhead).
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(BatchSize).flatMap(_.map(StubCodec.decode)))
  }

  /** Extract feature vectors (same batched map-only shape). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(BatchSize).flatMap(_.map(r =>
      MediaFeatures(r.id, r.kind, StubCodec.features(r)))))
  }

  /** Perceptual hash per media row — map-only like every payload
    * transform: the 100 TB of payload bytes never shuffle; only the
    * 16-byte (id, phash) rows leave the scan stage for the dedup join.
    */
  def perceptualHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(BatchSize).flatMap(_.map(r =>
      (r.id, StubCodec.perceptualHash(r.payload))))).toDF("id", "phash")
  }

  /** Resize stub: nearest-neighbor resample of the payload to exactly
    * `targetBytes` bytes (`out(i) = in(⌊i·n/target⌋)`) — the 1-D analog
    * of image rescaling, deterministic and map-only; a real codec would
    * decode, rescale pixels, re-encode in the same batched loop.
    * An EMPTY payload resamples to `targetBytes` zero bytes — the output
    * length is unconditionally `targetBytes`, matching what the oracle
    * replays (an empty-in-empty-out special case would silently diverge
    * from the SQL leg on any empty document).
    */
  def resize(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val n = r.payload.length
      val out =
        if (n == 0) new Array[Byte](targetBytes)
        else Array.tabulate(targetBytes)(i => r.payload(((i.toLong * n) / targetBytes).toInt))
      r.copy(payload = out)
    })
  }

  /** Frame-sample stub: keep every k-th "frame" (byte-block) of a video
    * payload — the real version would seek keyframes.
    */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): Dataset[MediaRow] = {
    require(everyK > 0, s"everyK must be positive, got $everyK")
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val sampled = r.payload.grouped(256).zipWithIndex
        .collect { case (block, i) if i % everyK == 0 => block }
        .flatten.toArray
      r.copy(payload = sampled)
    })
  }

  /** Build a synthetic media table from documents.text (the container
    * has no real media files): payload = utf-8 bytes, kind assigned
    * round-robin — enough to exercise every pipeline stage.
    */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
