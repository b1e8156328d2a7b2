package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lifecycle semantics of the memoized frozen range layouts that back
  * [[Ordinal]] and [[Scan]] — the properties the bench regression made
  * load-bearing: identical (plan, order) requests share ONE
  * materialization, an artifact `replace()` does not evict them, and a
  * corpus invalidation does.
  */
class FrozenLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def frame() =
    spark.range(1000).select(col("id"), (col("id") % 7).as("v"))

  test("identical plan + order share one frozen frame instance") {
    graft.Caches.clearAll()
    // two SEPARATE constructions of the same logical frame — the plan
    // canonicalization must collapse them onto one layout
    val a = FrozenLayout.freeze(frame(), Seq(col("id")))
    val b = FrozenLayout.freeze(frame(), Seq(col("id")))
    assert(a eq b, "same (plan, order) must memoize to one frozen frame")
    // a different order is a different layout
    val c = FrozenLayout.freeze(frame(), Seq(col("id").desc))
    assert(!(a eq c), "different order must not share the layout")
    // a different plan is a different layout
    val d = FrozenLayout.freeze(frame().filter(col("v") === 1), Seq(col("id")))
    assert(!(a eq d), "different input plan must not share the layout")
  }

  test("replace() keeps layouts; clearAll() evicts them") {
    graft.Caches.clearAll()
    val before = FrozenLayout.freeze(frame(), Seq(col("id")))
    // an artifact replace (the posting-index append path) must NOT
    // invalidate corpus-derived layouts — they read raw tables only
    graft.Caches.replace(spark, "/tmp/frozen_layout_spec", "demo") {
      spark.range(3).toDF("x")
    }
    val after = FrozenLayout.freeze(frame(), Seq(col("id")))
    assert(before eq after, "replace() must not evict frozen layouts")
    // a corpus/session invalidation DOES evict
    graft.Caches.clearAll()
    val rebuilt = FrozenLayout.freeze(frame(), Seq(col("id")))
    assert(!(before eq rebuilt), "clearAll() must evict frozen layouts")
  }

  test("same-named columns from a self-join get distinct layouts") {
    graft.Caches.clearAll()
    // two attributes that PRETTY-PRINT identically ("v") but resolve to
    // different sides of a self-join: a string-rendered order key would
    // collide, silently serving a layout frozen under the other side's
    // values — the memo must key on the resolved plan instead
    val left = spark.range(100).select(col("id"), (col("id") % 7).as("v"))
    val right = spark.range(100).select(col("id"), (col("id") % 13).as("v"))
    val j = left.join(right, "id")
    val a = FrozenLayout.freeze(j, Seq(left("v")))
    val b = FrozenLayout.freeze(j, Seq(right("v")))
    assert(!(a eq b), "orders resolving to different attributes must not collide")
  }

  test("memo is LRU-bounded and releases evicted checkpoint blocks") {
    graft.Caches.clearAll()
    val baseline = spark.sparkContext.getPersistentRDDs.size
    // overfill the memo well past the cap with distinct plans
    (0 until FrozenLayout.MaxEntries + 16).foreach { i =>
      FrozenLayout.freeze(
        spark.range(50 + i).select(col("id"), (col("id") % 5).as("v")),
        Seq(col("id")))
    }
    val pinned = spark.sparkContext.getPersistentRDDs.size - baseline
    assert(pinned <= FrozenLayout.MaxEntries,
      s"evicted layouts must unpersist: $pinned blocks pinned, cap ${FrozenLayout.MaxEntries}")
    graft.Caches.clearAll()
    assert(spark.sparkContext.getPersistentRDDs.size <= baseline,
      "clearAll must release every layout's blocks")
  }

  test("concurrent freeze/invalidate never strands checkpoint blocks") {
    graft.Caches.clearAll()
    val baseline = spark.sparkContext.getPersistentRDDs.size
    // hammer: 4 freezer threads over a rotating set of distinct plans,
    // racing a thread that invalidates everything repeatedly — the
    // build/evict race (eviction while a build is in flight) must not
    // leave blocks pinned once everything settles
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val freezers = (0 until 4).map { t =>
      new Thread(() => {
        try {
          (0 until 25).foreach { i =>
            FrozenLayout.freeze(
              spark.range(40 + (t * 25 + i) % 10)
                .select(col("id"), (col("id") % 3).as("v")),
              Seq(col("id"))).count()
          }
        } catch { case e: Throwable => errs.add(e) }
      }, s"flspec-freeze-$t")
    }
    val invalidator = new Thread(() => {
      try (0 until 50).foreach { _ =>
        graft.Caches.clearAll(); Thread.sleep(2)
      } catch { case e: Throwable => errs.add(e) }
    }, "flspec-invalidate")
    (freezers :+ invalidator).foreach(_.start())
    (freezers :+ invalidator).foreach(_.join())
    // a freeze racing an invalidation may legitimately fail ITS job
    // (checkpoint blocks evicted mid-read) — the invariant under test is
    // the leak, not lossless concurrent invalidation
    graft.Caches.clearAll()
    assert(spark.sparkContext.getPersistentRDDs.size <= baseline,
      s"blocks stranded after settling: ${spark.sparkContext.getPersistentRDDs.size - baseline}")
  }

  test("ordinals stay correct and consistent across re-invocations") {
    graft.Caches.clearAll()
    // the at-scale failure mode was OVERLAPPING ordinals when the two
    // consumers of the range exchange saw different sampled bounds —
    // 0..n-1 exactly, twice, through the memoized layout
    (1 to 2).foreach { _ =>
      val ords = Ordinal.withOrdinal(frame(), Seq(col("id")), "ord")
        .select("ord").as[Long].collect().sorted
      assert(ords.toSeq == (0L until 1000L).toSeq)
    }
  }
}
