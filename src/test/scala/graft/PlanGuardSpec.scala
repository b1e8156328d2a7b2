package graft

/** Cross-cutting regression nets over the WHOLE registered query
  * surface — cheap global invariants a per-module spec can't see.
  */
class PlanGuardSpec extends SparkSpec {

  test("query and oracle registries are collision-free and consistent") {
    // SparkEntry flattens module maps with toMap, which would silently
    // SHADOW a duplicate name (two modules registering q_x = one wins,
    // the other's oracle checks the wrong plan)
    val qNames = SparkEntry.modules.flatMap(_.queries.keys)
    val qDup = qNames.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(qDup.isEmpty, s"duplicate query names across modules: $qDup")
    val oNames = SparkEntry.modules.flatMap(_.oracleSql.keys)
    val oDup = oNames.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(oDup.isEmpty, s"duplicate oracle names across modules: $oDup")
    // an oracle without a query is dead weight that LOOKS like coverage
    val orphans = oNames.toSet -- qNames.toSet
    assert(orphans.isEmpty, s"oracle SQL with no registered query: $orphans")
    // the driver treats oracle-less queries as weaker rows-only checks —
    // keep that set explicitly empty so nothing regresses to it silently
    val unoracled = qNames.toSet -- oNames.toSet
    assert(unoracled.isEmpty,
      s"queries without oracle SQL (rows-only check): $unoracled")
  }

  // The one query whose SEMANTICS are a cross product.
  private val allowCartesian = Set("q_join_cross")

  test("no registered query plans a non-broadcast cartesian product") {
    // CartesianProductExec is the unconditioned fact×fact scale-killer;
    // broadcast-one-row cross joins (scalar attachment) plan as
    // BroadcastNestedLoopJoin and stay allowed. Plans are BUILT, not
    // executed — but building streaming-drain queries materializes
    // their standing artifact once (same as any memoized artifact).
    val sf = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct") && !allowCartesian(name)) Some(name)
      else None
    }
    assert(bad.isEmpty, s"cartesian product in: $bad")
  }
}
