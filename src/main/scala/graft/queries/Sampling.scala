package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data assembly (beyond-reference
  * LLM-pipeline suite): mixture weighting and split assignment both
  * derive from a content-stable hash bucket, NOT `rand()` — the same
  * row lands in the same sample and split on every engine, every run,
  * any partitioning, which is what makes sampled corpora reproducible
  * and incrementally extendable at 100 TB (and lets DuckDB replay the
  * exact result).
  *
  * Shape: map-only (hash + filter per row), streams at scan speed; the
  * only shuffle is the presentation sort.
  */
object Sampling extends QueryModule {

  /** 0..99 hash bucket from md5 of the doc id — stable, uniform. */
  private val bucketExpr =
    "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 100"

  /** Per-language sampling rates (percent) — the mixture weights. */
  private val rates = Seq("en" -> 50, "fr" -> 25, "de" -> 25) // others: 10

  /** Stratified deterministic sample + train/val split: keep a doc when
    * its hash bucket falls under its language's mixture rate; surviving
    * docs split 80/20 by a decade of the same bucket.
    */
  def qSampleStratified(s: SparkSession, dir: String): DataFrame = {
    val rateCol = rates.foldRight(lit(10)) { case ((l, r), acc) =>
      when(col("lang") === l, r).otherwise(acc)
    }
    Tables.documents(s, dir)
      .withColumn("bucket", expr(bucketExpr))
      .withColumn("rate", rateCol)
      .filter(col("bucket") < col("rate"))
      .withColumn("split",
        when(pmod(col("bucket"), lit(10)) < 8, "train").otherwise("val"))
      .select("doc_id", "lang", "bucket", "split")
      .orderBy("doc_id")
  }

  /** Fixed-SIZE deterministic sample: the K docs per source with the
    * smallest content-hash bucket (doc_id tie-break) — the "give me
    * exactly 5 inspection docs per source" operator, reproducible under
    * re-runs and corpus growth-at-the-tail. The rank window partitions
    * by source, so parallelism is #sources and no global sort exists;
    * at a 10^6-doc-per-source corpus the same plan holds (per-partition
    * top-K via the window's running rank, never a full materialized
    * sort of the corpus).
    */
  private val FixedK = 5

  def qSampleFixed(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("bucket"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("bucket", expr(bucketExpr))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= FixedK)
      .select("source", "doc_id", "bucket", "rn")
      .orderBy("source", "rn")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_stratified" -> (qSampleStratified(_, _)),
    "q_sample_fixed" -> (qSampleFixed(_, _)))

  private val sqlBucket =
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100"

  val oracleSql: Map[String, String] = Map(
    "q_sample_stratified" ->
      s"""WITH b AS (
         |  SELECT doc_id, lang, $sqlBucket AS bucket,
         |    CASE lang WHEN 'en' THEN 50 WHEN 'fr' THEN 25
         |      WHEN 'de' THEN 25 ELSE 10 END AS rate
         |  FROM documents)
         |SELECT doc_id, lang, bucket,
         |  CASE WHEN bucket % 10 < 8 THEN 'train' ELSE 'val' END AS split
         |FROM b WHERE bucket < rate ORDER BY doc_id""".stripMargin,
    "q_sample_fixed" ->
      s"""WITH b AS (
         |  SELECT source, doc_id, CAST($sqlBucket AS BIGINT) AS bucket
         |  FROM documents),
         |r AS (SELECT source, doc_id, bucket,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY bucket, doc_id) AS INTEGER) AS rn
         |  FROM b)
         |SELECT source, doc_id, bucket, rn FROM r
         |WHERE rn <= $FixedK ORDER BY source, rn""".stripMargin)
}
