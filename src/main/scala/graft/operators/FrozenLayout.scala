package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Frozen range layouts for the prefix-scan machinery ([[Ordinal]],
  * [[Scan]]) — one materialized `repartitionByRange` per distinct
  * (session, input plan, order), shared by every consumer.
  *
  * Why freezing is needed at all: the scan layout is consumed TWICE
  * (per-partition offsets aggregate + the windowed main branch), and
  * correctness requires both to see the SAME partition boundaries.
  * RangePartitioner SAMPLES its bounds, and whether two physical
  * executions of the subplan agree depends on exchange reuse — which is
  * not guaranteed (measured: at sf0.1 under a persist() wrapper the two
  * branches got different bounds, baking overlapping ordinals into the
  * cached artifact; invisible at sf0.01 where the sample covers the
  * data). `localCheckpoint` freezes ONE materialized layout both
  * consumers read; unlike persist(), an evicted checkpoint block fails
  * the job instead of silently recomputing with fresh bounds.
  *
  * Why memoized: the checkpoint is EAGER — without memoization every
  * construction of a scan-bearing DataFrame runs the materialization
  * job again and leaves the previous run's blocks to the garbage
  * collector. A bench pass re-invoking each query 2–3 times turned that
  * into hundreds of orphaned block sets, evicting the shared per-corpus
  * artifacts and collapsing throughput (measured 204 s vs ~78 s at
  * sf0.1). Keying by the CANONICALIZED input plan collapses re-built
  * identical frames onto one layout — the in-session analog of writing
  * the range-layout table once per corpus, which is what a 100 TB
  * pipeline does here anyway.
  *
  * Lifecycle mirrors [[graft.Caches]]: entries are dropped (and their
  * checkpoint blocks unpersisted) through the same eviction hooks, so
  * `Caches.clear`/`clearAll`/`replace` invalidate layouts too; the same
  * corpus-dir-immutability assumption applies.
  */
object FrozenLayout {

  // Key: canonicalized analyzed plan (structural equality, exprIds
  // normalized) + the order's SQL rendering (name + direction; exprId
  // free). A HASH alone would risk collisions = silent wrong layouts.
  private type Key = (SparkSession, Any, String)

  private final class Holder(build: () => DataFrame) {
    @volatile private var builtOpt: Option[DataFrame] = None
    lazy val df: DataFrame = { val d = build(); builtOpt = Some(d); d }
    def peek: Option[DataFrame] = builtOpt
  }

  private val entries = new ConcurrentHashMap[Key, Holder]()

  locally {
    // onInvalidate, not onClear: layouts read raw corpus tables only,
    // so an artifact replace() (e.g. the posting-index append) does not
    // stale them — evicting there forced a full layout-rebuild storm
    // right after every append query in a bench pass.
    graft.Caches.onInvalidate { sOpt =>
      val it = entries.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (sOpt.forall(_ eq e.getKey._1)) {
          e.getValue.peek.foreach(release)
          it.remove()
        }
      }
    }
  }

  /** Best-effort release of a localCheckpoint's blocks: the checkpointed
    * frame's plan is a [[LogicalRDD]] over the cached RDD — unpersist it
    * directly instead of waiting for the ContextCleaner's GC cycle.
    */
  private def release(df: DataFrame): Unit =
    try {
      df.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }
        .foreach(_.unpersist(blocking = false))
    } catch { case _: Throwable => }

  /** The frozen layout of `df` under `order`: range-partitioned, with a
    * `__pid` partition-id column, localCheckpoint-materialized, memoized.
    */
  def freeze(df: DataFrame, order: Seq[Column]): DataFrame = {
    val s = df.sparkSession
    val planKey: Any = df.queryExecution.analyzed.canonicalized
    val orderKey = order.map(_.toString).mkString(",")
    entries
      .computeIfAbsent((s, planKey, orderKey),
        _ => new Holder(() =>
          df.repartitionByRange(order: _*)
            .withColumn("__pid", spark_partition_id())
            .localCheckpoint()))
      .df
  }
}
