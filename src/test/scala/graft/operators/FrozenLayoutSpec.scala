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
