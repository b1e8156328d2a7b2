package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries (LLM-pipeline suite).
  *
  * `q_multimodal_meta` — binary-column handling that IS
  * SQL-expressible (payload synthesis, byte length, content digest) —
  * gets a full DuckDB oracle. `q_multimodal_pipeline` exercises the
  * typed mapPartitions pipeline in [[graft.operators.Multimodal]]
  * (stub codec → metadata + features → join → rollup); the stub's
  * math is pure integer/float arithmetic over payload bytes, so the
  * oracle reimplements it value-exactly in SQL — no rows-only
  * cop-out.
  */
object MultimodalQ extends QueryModule {

  /** Binary payload + metadata columns, digest + sizes — pure SQL. */
  def qMultimodalMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        sha2(encode(col("text"), "UTF-8"), 256).as("digest"),
        ascii(col("text")).as("first_code"))
      .orderBy("doc_id")

  /** Full stub pipeline: synth media → decode meta → features → join →
    * per-kind rollup. Map-only until the final tiny aggregation.
    */
  def qMultimodalPipeline(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMedia(s, dir)
    val meta = Multimodal.decodeMeta(media)
    val feats = Multimodal.extractFeatures(media)
    meta.toDF().join(feats.toDF().select(col("id"), col("features")), "id")
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        Q.dsum(col("nBytes")).as("total_bytes"),
        max(col("width")).as("max_width"),
        Q.davg(expr("CAST(element_at(features, 1) AS DOUBLE)")).as("mean_f0"))
      .orderBy("kind")
  }

  /** Resize-then-decode: nearest-neighbor resample every payload to 64
    * bytes, decode the resized media — per-row metadata out, value-exact
    * against the oracle's replay of the same byte sampling.
    */
  def qMultimodalResize(s: SparkSession, dir: String): DataFrame = {
    val resized = Multimodal.resize(Multimodal.syntheticMedia(s, dir), 64)
    Multimodal.decodeMeta(resized).toDF()
      .select("id", "kind", "nBytes", "width", "height")
      .orderBy("id")
  }

  /** Frame-sample-then-decode: keep every 2nd 256-byte "frame" block of
    * each payload (the stub for keyframe sampling), decode the sampled
    * media — per-row metadata out. The sampling is pure byte-position
    * arithmetic, so the oracle replays it value-exactly from the hex
    * view without reconstructing binary.
    */
  def qMultimodalFrames(s: SparkSession, dir: String): DataFrame = {
    val sampled = Multimodal.sampleFrames(Multimodal.syntheticMedia(s, dir), 2)
    Multimodal.decodeMeta(sampled).toDF()
      .select("id", "kind", "nBytes", "width", "height", "nFrames")
      .orderBy("id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta(_, _)),
    "q_multimodal_resize" -> (qMultimodalResize(_, _)),
    "q_multimodal_frames" -> (qMultimodalFrames(_, _)),
    "q_multimodal_pipeline" -> (qMultimodalPipeline(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  sha256(text) AS digest,
        |  ascii(text) AS first_code
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Replays resize(64) + StubCodec.decode: bytes from hex pairs,
    // nearest-neighbor index ⌊i·nb/64⌋ (integer division both engines),
    // then the decode width/height formulas over the SAMPLED sum. An
    // empty payload resamples to 64 zero bytes (s = 0), mirroring
    // Multimodal.resize's defined empty case.
    "q_multimodal_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS nb,
        |    hex(encode(text)) AS hx
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, kind, nb,
        |    list_transform(range(0, 64), i ->
        |      (strpos('0123456789ABCDEF',
        |         substring(hx, CAST(2 * ((i * nb) // 64) + 1 AS INTEGER), 1)) - 1) * 16
        |      + (strpos('0123456789ABCDEF',
        |         substring(hx, CAST(2 * ((i * nb) // 64) + 2 AS INTEGER), 1)) - 1)) AS sb
        |  FROM m),
        |d AS (SELECT doc_id, kind,
        |    CAST(CASE WHEN nb = 0 THEN 0
        |      ELSE COALESCE(list_sum(sb), 0) END AS BIGINT) AS s FROM b)
        |SELECT doc_id AS id, kind, CAST(64 AS BIGINT) AS "nBytes",
        |  CAST(64 + (s + 7 * 64) % 1856 AS INTEGER) AS width,
        |  CAST(64 + (s // 7 + 64) % 1016 AS INTEGER) AS height
        |FROM d ORDER BY id""".stripMargin,
    // Replays sampleFrames(2) + decode: kept byte positions are pure
    // index arithmetic ((p // 256) % 2 = 0), byte values from hex
    // pairs, then the decode formulas over the SAMPLED length and sum.
    "q_multimodal_frames" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS nb,
        |    hex(encode(text)) AS hx
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, kind, hx,
        |    list_filter(range(0, CAST(nb AS INTEGER)), i -> (i // 256) % 2 = 0) AS keep
        |  FROM m),
        |d AS (
        |  SELECT doc_id, kind,
        |    CAST(len(keep) AS BIGINT) AS snb,
        |    CAST(COALESCE(list_sum(list_transform(keep, i ->
        |      (strpos('0123456789ABCDEF', substring(hx, CAST(2*i + 1 AS INTEGER), 1)) - 1) * 16
        |      + (strpos('0123456789ABCDEF', substring(hx, CAST(2*i + 2 AS INTEGER), 1)) - 1))),
        |      0) AS BIGINT) AS s
        |  FROM p)
        |SELECT doc_id AS id, kind, snb AS "nBytes",
        |  CAST(64 + (s + 7 * snb) % 1856 AS INTEGER) AS width,
        |  CAST(64 + (s // 7 + snb) % 1016 AS INTEGER) AS height,
        |  CAST(CASE WHEN kind = 'video' THEN 1 + snb % 300 ELSE 1 END AS INTEGER) AS "nFrames"
        |FROM d ORDER BY id""".stripMargin,
    // DuckDB reimplementation of the WHOLE stub pipeline: byte values
    // recovered from hex(payload) pairs; StubCodec.decode's width and
    // StubCodec.features' f0 (fraction of bytes ≡ 0 mod 16, single
    // float division) are pure integer/float math. The float value is
    // reproduced by casting the double quotient to REAL — double
    // rounding differs from the JVM's single float division only within
    // 2^-29 of a representable boundary, i.e. never on this data.
    "q_multimodal_pipeline" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS nb,
         |    hex(encode(text)) AS hx
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, kind, nb,
         |    list_transform(range(1, CAST(nb AS INTEGER) + 1),
         |      i -> (strpos('0123456789ABCDEF', substring(hx, 2*i - 1, 1)) - 1) * 16
         |         + (strpos('0123456789ABCDEF', substring(hx, 2*i, 1)) - 1)) AS bytes
         |  FROM m),
         |d AS (
         |  SELECT doc_id, kind, nb,
         |    CAST(COALESCE(list_sum(bytes), 0) AS BIGINT) AS s,
         |    CAST(COALESCE(list_sum(list_transform(bytes,
         |      x -> CASE WHEN x % 16 = 0 THEN 1 ELSE 0 END)), 0) AS BIGINT) AS c0
         |  FROM b)
         |SELECT kind, count(*) AS n,
         |  ${Q.sqlDsum("nb")} AS total_bytes,
         |  CAST(max(64 + (s + 7 * nb) % 1856) AS INTEGER) AS max_width,
         |  ${Q.sqlDavg("CAST(CAST(CAST(c0 AS DOUBLE) / GREATEST(nb, 1) AS REAL) AS DOUBLE)")} AS mean_f0
         |FROM d GROUP BY kind ORDER BY kind""".stripMargin)
}
