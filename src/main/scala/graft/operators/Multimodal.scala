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
