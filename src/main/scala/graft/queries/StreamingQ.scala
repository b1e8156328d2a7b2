package graft.queries

import graft.streaming.{StreamDrain, StreamOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Driver-checked STREAMING queries — the windowed aggregates from
  * [[graft.streaming.StreamOps]] run as real Structured Streaming jobs
  * (file source → complete-mode aggregate → availableNow drain into a
  * memory sink, [[graft.streaming.StreamDrain]]) and answer the SAME
  * oracle SQL as their batch twins in [[Windows]]. Batch↔stream
  * equivalence is thereby a hash-checked claim on every driver round,
  * not only a spec assertion (the q_ks_drift_stream pattern,
  * generalized). Each drained table is a once-per-(session, corpus)
  * artifact: in production these monitors run continuously and
  * consumers read their sinks.
  */
object StreamingQ extends QueryModule {

  /** The same ts normalization [[graft.Tables.events]] applies, as a
    * stream-safe plan transform (the file source hands us the raw
    * parquet schema).
    */
  private def normTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }

  /** Streaming tumbling hourly counts ≡ [[Windows.qWindowTumbling]] —
    * the [[StreamOps.tumblingCounts]] operator verbatim (decimal-exact
    * sums; watermark inert under the complete-mode drain).
    */
  def qStreamTumbling(s: SparkSession, dir: String): DataFrame =
    StreamDrain.drained(s, dir, "stream_tumbling", "events")(st =>
        StreamOps.tumblingCounts(normTs(st)))
      .orderBy("bucket", "event_type")

  /** Streaming sliding 1h/30m windows ≡ [[Windows.qWindowSliding]]:
    * watermarked two-grid window aggregate with the decimal-exact sum
    * discipline.
    */
  def qStreamSliding(s: SparkSession, dir: String): DataFrame =
    StreamDrain.drained(s, dir, "stream_sliding", "events")(st =>
        normTs(st)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(28,4)")).cast("double").as("sum_value"))
          .select(col("window.start").as("bucket"), col("n"), col("sum_value")))
      .orderBy("bucket")

  override def prewarm(s: SparkSession, dir: String): Unit = {
    // both drains are independent of every other artifact — they run
    // at the head of prep and overlap the index chains
    qStreamTumbling(s, dir).count()
    qStreamSliding(s, dir).count(); ()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tumbling" -> (qStreamTumbling(_, _)),
    "q_stream_sliding" -> (qStreamSliding(_, _)))

  // identical SQL to the batch twins — equivalence is the claim
  val oracleSql: Map[String, String] = Map(
    "q_stream_tumbling" ->
      s"""WITH e AS (${Windows.evSql})
         |SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
         |  count(*) AS n, ${Q.sqlDsum("value")} AS sum_value
         |FROM e GROUP BY bucket, event_type
         |ORDER BY bucket, event_type""".stripMargin,
    "q_stream_sliding" ->
      s"""WITH e AS (${Windows.evSql})
         |SELECT bucket, count(*) AS n, ${Q.sqlDsum("value")} AS sum_value
         |FROM (
         |  SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, value FROM e
         |  UNION ALL
         |  SELECT time_bucket(INTERVAL '1 hour', ts,
         |    INTERVAL '30 minutes') AS bucket, value FROM e)
         |GROUP BY bucket ORDER BY bucket""".stripMargin)
}
