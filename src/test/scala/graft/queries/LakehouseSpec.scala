package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic contracts for the CDC merge and SCD2 history that the
  * oracle hash-compare can't state: merge ≡ latest-overall state, and
  * the SCD2 interval algebra (per-key tiling, no gaps/overlaps, change
  * compression).
  */
class LakehouseSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("upsert merge equals the from-scratch latest-per-key state") {
    val merged = Lakehouse.qUpsertMerge(spark, sf)
      .select("user_id", "event_type", "value", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getDouble(2), r.getTimestamp(3))).toMap
    val scratch = graft.Tables.events(spark, sf)
      .groupBy("user_id", "event_type")
      .agg(max_by(struct(col("value"), col("ts")),
        struct(col("ts"), col("event_id"))).as("st"))
      .select(col("user_id"), col("event_type"), col("st.value"), col("st.ts"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getDouble(2), r.getTimestamp(3))).toMap
    assert(merged == scratch,
      "incremental merge must equal recomputing latest state from scratch")
  }

  test("merge actions partition the key space and match the batch boundary") {
    val r = Lakehouse.qUpsertMerge(spark, sf).collect()
    val byAction = r.groupBy(_.getString(4)).view.mapValues(_.length).toMap
    assert(byAction.keySet.subsetOf(Set("carry", "insert", "update")))
    assert(byAction.getOrElse("update", 0) > 0, "fixture must exercise updates")
    val keys = r.map(x => (x.getLong(0), x.getString(1)))
    assert(keys.distinct.length == keys.length, "one output row per key")
  }

  test("scd2 intervals tile each key's history with no gaps or overlaps") {
    val rows = Lakehouse.qScd2(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getLong(0), r.getString(1))).foreach { case (k, h) =>
      val chain = h.sortBy(_.getTimestamp(3).getTime)
      // exactly one open (current) interval per key, and it is the last
      assert(chain.count(_.getBoolean(5)) == 1, s"$k: exactly one current row")
      assert(chain.last.isNullAt(4) && chain.last.getBoolean(5))
      // each interval's valid_to is the next interval's valid_from
      chain.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(4) == b.getTimestamp(3), s"$k: gap or overlap")
        case _ =>
      }
      // change compression: consecutive intervals carry different attrs
      chain.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(2) != b.getLong(2), s"$k: uncompressed run")
        case _ =>
      }
    }
  }

  test("scd2 replays to the same current state as the merge's value tier") {
    val current = Lakehouse.qScd2(spark, sf).filter(col("is_current"))
      .select("user_id", "event_type", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val merged = Lakehouse.qUpsertMerge(spark, sf)
      .select(col("user_id"), col("event_type"),
        floor(col("value") / 50.0).as("attr")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(current == merged,
      "the open SCD2 interval must carry the post-merge attribute")
  }
}
