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
  * (stub codec → metadata + features); its codec stub is Scala-only,
  * so the driver records the rows>0 check for it.
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
    meta.toDF.join(feats.toDF.select(col("id"), col("features")), "id")
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        Q.dsum(col("nBytes")).as("total_bytes"),
        max(col("width")).as("max_width"),
        Q.davg(expr("CAST(element_at(features, 1) AS DOUBLE)")).as("mean_f0"))
      .orderBy("kind")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta(_, _)),
    "q_multimodal_pipeline" -> (qMultimodalPipeline(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  sha256(text) AS digest,
        |  ascii(text) AS first_code
        |FROM documents ORDER BY doc_id""".stripMargin)
}
