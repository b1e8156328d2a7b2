package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
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
  * sf0.1). Keying by the CANONICALIZED range-partitioned plan collapses
  * re-built identical frames onto one layout — the in-session analog of
  * writing the range-layout table once per corpus, which is what a
  * 100 TB pipeline does here anyway.
  *
  * Key discipline: the memo key is the canonicalized ANALYZED PLAN of
  * the `repartitionByRange(order)` frame itself, so the order's resolved
  * expressions (exprIds normalized structurally) are part of the key.
  * An earlier revision keyed on `order.map(_.toString)`, which collides
  * for two same-named columns resolving to different attributes (e.g.
  * the two sides of a self-join) — pinned by FrozenLayoutSpec.
  *
  * Lifecycle:
  *  - entries are evicted (and their checkpoint blocks unpersisted)
  *    through [[graft.Caches]]'s invalidation hooks, so `Caches.clear`/
  *    `clearAll` invalidate layouts too (same corpus-dir-immutability
  *    assumption); an artifact `replace()` does NOT evict them (layouts
  *    read raw corpus tables only);
  *  - every session that ever froze a layout gets ONE app-end listener
  *    (registered here, not via Caches.memo, so sessions that use only
  *    the scan machinery still release their blocks on stop);
  *  - the memo is LRU-BOUNDED ([[MaxEntries]]): a long-lived interactive
  *    session constructing many distinct frames evicts (and releases)
  *    the least-recently-used layout instead of pinning blocks forever;
  *  - an eviction racing an in-flight build is closed by the holder: the
  *    builder re-checks the evicted flag after materializing and
  *    releases its own blocks if it lost the race.
  */
object FrozenLayout {

  /** LRU bound on memoized layouts per JVM. Each entry pins one frame's
    * localCheckpoint blocks; the in-repo workloads need a handful per
    * corpus, so 64 is generous headroom, not a tuning knob.
    */
  private[operators] val MaxEntries = 64

  // Key: the canonicalized analyzed plan of the range-partitioned frame
  // (order expressions included, exprIds normalized). A HASH alone would
  // risk collisions = silent wrong layouts; the full plan is structural.
  private type Key = (SparkSession, Any)

  private final class Holder(build: () => DataFrame) {
    @volatile private var builtOpt: Option[DataFrame] = None
    @volatile private var evicted = false
    lazy val df: DataFrame = {
      val d = build()
      builtOpt = Some(d)
      // Eviction may have raced the build: peek() returned None then, so
      // the evictor could not release — the builder does it itself.
      if (evicted) release(d)
      d
    }
    /** Mark evicted and release blocks if (and whenever) they exist. */
    def evict(): Unit = { evicted = true; builtOpt.foreach(release) }
  }

  // Access-ordered LRU; ALL map operations synchronize on the map (the
  // build itself runs outside the lock, serialized by the holder's lazy
  // val). removeEldestEntry releases the evictee's blocks.
  private val entries =
    new java.util.LinkedHashMap[Key, Holder](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Key, Holder]): Boolean =
        if (size() > MaxEntries) { e.getValue.evict(); true } else false
    }

  private val hooked =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private def invalidate(sOpt: Option[SparkSession]): Unit =
    entries.synchronized {
      val it = entries.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (sOpt.forall(_ eq e.getKey._1)) {
          e.getValue.evict()
          it.remove()
        }
      }
    }

  locally {
    // onInvalidate, not onClear: layouts read raw corpus tables only,
    // so an artifact replace() (e.g. the posting-index append) does not
    // stale them — evicting there forced a full layout-rebuild storm
    // right after every append query in a bench pass.
    graft.Caches.onInvalidate(invalidate)
  }

  /** Best-effort release of a localCheckpoint's blocks: the checkpointed
    * frame's plan is a [[LogicalRDD]] over the cached RDD — unpersist it
    * directly instead of waiting for the ContextCleaner's GC cycle.
    * Idempotent (unpersist of an unpersisted RDD is a no-op).
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
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            end: SparkListenerApplicationEnd): Unit = invalidate(Some(s))
      })
    }
    val ranged = df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
    val key: Key = (s, ranged.queryExecution.analyzed.canonicalized)
    val holder = entries.synchronized {
      var h = entries.get(key)
      if (h == null) {
        h = new Holder(() => ranged.localCheckpoint())
        entries.put(key, h)
      }
      h
    }
    holder.df
  }
}
