package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance semantics a 100 TB lakehouse pipeline runs daily
  * (beyond-reference suite): CDC upsert MERGE and SCD2 history build.
  * Both treat `events` as a change stream keyed by (user_id,
  * event_type) — 750 keys × ~13 versions in the fixture.
  *
  * Exactness across engines: keys and versions are integers/timestamps,
  * the tracked attribute is `floor(value / 50)` (floor of a shared
  * double division — bit-identical on both engines), and payloads are
  * carried, never aggregated arithmetically.
  */
object Lakehouse extends QueryModule {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select("event_id", "user_id", "event_type", "value", "ts")

  private val evSql =
    """SELECT event_id, user_id, event_type, value,
      |  CAST(ts AS TIMESTAMP) AS ts FROM events""".stripMargin

  /** The CDC batch boundary — midpoint of the event_id range: events
    * with id ≤ cutoff are the standing base table, the rest the
    * incoming change batch. event_id is ingest-ordered in the fixture;
    * in production this is the ingest watermark. One tiny min/max
    * scalar (same class as the histogram-bounds fetch); `//`/Scala `/`
    * agree because ids are non-negative.
    */
  private def cutoff(s: SparkSession, dir: String): Long =
    graft.Caches.memoSide(s, dir, "events_cutoff") {
      val r = ev(s, dir).agg(min("event_id"), max("event_id")).first()
      (r.getLong(0) + r.getLong(1)) / 2
    }

  private val cutoffSql = "(SELECT (min(event_id) + max(event_id)) // 2 FROM e)"

  /** Delta-style MERGE INTO (upsert): fold the change batch into the
    * base snapshot, emitting the post-merge state of every key plus the
    * merge action taken ('update' when the batch rewrote a live key,
    * 'insert' for a first-seen key, 'carry' for untouched base keys).
    *
    * Plan: each side collapses to its latest version per key with a
    * `max_by(struct(version), payload)` HASH aggregate (map-side
    * partials — never a per-key sort window), then ONE full-outer
    * shuffle join on the key. At 100 TB the base side is the bucketed
    * artifact ([[graft.sources.Io]] bucketed write), making the merge
    * exchange-free on the big side; the change batch is the small,
    * freshly-shuffled input. Nothing here scales with history length —
    * only with key count and batch size.
    */
  def qUpsertMerge(s: SparkSession, dir: String): DataFrame = {
    def latest(df: DataFrame) = df
      .groupBy("user_id", "event_type")
      .agg(max_by(
        struct(col("value"), col("ts")),
        struct(col("ts"), col("event_id"))).as("st"))
      .select(col("user_id"), col("event_type"),
        col("st.value").as("value"), col("st.ts").as("ts"))
    val cut = cutoff(s, dir)
    val base = latest(ev(s, dir).filter(col("event_id") <= cut))
      .withColumnRenamed("value", "b_value").withColumnRenamed("ts", "b_ts")
    val changes = latest(ev(s, dir).filter(col("event_id") > cut))
      .withColumnRenamed("value", "c_value").withColumnRenamed("ts", "c_ts")
    base.join(changes, Seq("user_id", "event_type"), "full_outer")
      .select(col("user_id"), col("event_type"),
        coalesce(col("c_value"), col("b_value")).as("value"),
        coalesce(col("c_ts"), col("b_ts")).as("ts"),
        when(col("c_ts").isNull, "carry")
          .when(col("b_ts").isNull, "insert")
          .otherwise("update").as("action"))
      .orderBy("user_id", "event_type")
  }

  /** SCD2 (slowly-changing-dimension type 2) history: per key, the
    * tracked attribute's CHANGE-COMPRESSED version chain with validity
    * intervals — `valid_from` = first ts observing the value,
    * `valid_to` = the next change's ts (NULL while current).
    *
    * Two per-key ordered windows with a change filter between them
    * (lag → keep rows where the attribute moved → lead): both windows
    * partition by the key, so parallelism is #keys and no global sort
    * exists; a key's state in each window is one row. The change filter
    * runs BEFORE the second window, so the lead only scans the
    * compressed chain. Spec asserts the interval algebra: per key,
    * intervals tile [first ts, ∞) with no gaps or overlaps.
    */
  def qScd2(s: SparkSession, dir: String): DataFrame = {
    val key = Seq(col("user_id"), col("event_type"))
    val wOrd = Window.partitionBy(key: _*).orderBy("ts", "event_id")
    val attr = floor(col("value") / 50.0).as("attr")
    val changed = ev(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"), attr)
      .withColumn("prev", lag(col("attr"), 1).over(wOrd))
      .filter(col("prev").isNull || col("attr") =!= col("prev"))
    changed
      .withColumn("valid_to", lead(col("ts"), 1).over(wOrd))
      .select(col("user_id"), col("event_type"), col("attr"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "event_type", "valid_from")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_upsert_merge" -> (qUpsertMerge(_, _)),
    "q_scd2" -> (qScd2(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q_upsert_merge" ->
      s"""WITH e AS ($evSql),
         |base AS (SELECT user_id, event_type, value AS b_value, ts AS b_ts
         |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
         |      ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM e WHERE event_id <= $cutoffSql) WHERE rn = 1),
         |chg AS (SELECT user_id, event_type, value AS c_value, ts AS c_ts
         |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
         |      ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM e WHERE event_id > $cutoffSql) WHERE rn = 1)
         |SELECT user_id, event_type,
         |  coalesce(c_value, b_value) AS value,
         |  coalesce(c_ts, b_ts) AS ts,
         |  CASE WHEN c_ts IS NULL THEN 'carry'
         |       WHEN b_ts IS NULL THEN 'insert'
         |       ELSE 'update' END AS action
         |FROM base b FULL OUTER JOIN chg c USING (user_id, event_type)
         |ORDER BY user_id, event_type""".stripMargin,
    "q_scd2" ->
      s"""WITH e AS ($evSql),
         |a AS (SELECT user_id, event_type, ts, event_id,
         |    CAST(floor(value / 50.0) AS BIGINT) AS attr FROM e),
         |chg AS (SELECT * FROM (SELECT *,
         |    lag(attr) OVER (PARTITION BY user_id, event_type
         |      ORDER BY ts, event_id) AS prev FROM a)
         |  WHERE prev IS NULL OR attr <> prev)
         |SELECT user_id, event_type, attr, ts AS valid_from,
         |  lead(ts) OVER (PARTITION BY user_id, event_type
         |    ORDER BY ts, event_id) AS valid_to,
         |  (lead(ts) OVER (PARTITION BY user_id, event_type
         |    ORDER BY ts, event_id) IS NULL) AS is_current
         |FROM chg
         |ORDER BY user_id, event_type, valid_from""".stripMargin)
}
