package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic contracts for the record-linkage fuzzy join (FastSS
  * deletion-neighborhood blocking) and kNN label propagation that the
  * oracle hash-compare can't state: blocking completeness vs the naive
  * quadratic join, and the propagation invariants (seed immutability,
  * monotone coverage, label-domain closure).
  */
class LinkPropSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("fuzzy join equals the naive quadratic join (blocking is complete)") {
    val blocked = Dedup.qFuzzyJoin(spark, dir)
      .select("name_a", "name_b", "dist").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val names = graft.Tables.part(spark, dir).select("p_name").distinct()
    val naive = names.as("a").crossJoin(names.as("b"))
      .filter(col("a.p_name") < col("b.p_name"))
      .withColumn("dist", levenshtein(col("a.p_name"), col("b.p_name")))
      .filter(col("dist") <= 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(blocked == naive,
      "deletion-neighborhood blocking must lose no pair vs the cross join")
    assert(naive.nonEmpty, "fixture must contain fuzzy matches")
  }

  test("fuzzy join confirms with exact distance: no pair beyond tau, no self pairs") {
    val rows = Dedup.qFuzzyJoin(spark, dir).collect()
    assert(rows.forall(r => r.getInt(4) >= 1 && r.getInt(4) <= 2))
    assert(rows.forall(r => r.getString(0) < r.getString(2)),
      "pairs are canonically ordered, each emitted once")
  }

  test("label prop: seeds keep their true label; labels stay in the domain") {
    val out = Similarity.qLabelProp(spark, dir).cache()
    try {
      val seeds = out.filter(col("seed"))
      assert(seeds.filter(col("label") =!= col("true_label")).count() == 0,
        "a seed's label must never change")
      val domain = graft.Tables.embeddings(spark, dir)
        .select("label").distinct().collect().map(_.getInt(0)).toSet
      val assigned = out.filter(col("label").isNotNull)
        .select("label").distinct().collect().map(_.getInt(0)).toSet
      assert(assigned.subsetOf(domain),
        "propagated labels can only come from seed labels")
      // one output row per vector — propagation never drops or dups nodes
      assert(out.count() == graft.Tables.embeddings(spark, dir).count())
    } finally { out.unpersist(); () }
  }

  test("label prop coverage grows with rounds and reaches most non-seeds") {
    val out = Similarity.qLabelProp(spark, dir)
    val nonSeed = out.filter(!col("seed")).cache()
    try {
      val n = nonSeed.count()
      val labeled = nonSeed.filter(col("label").isNotNull).count()
      // GraphK=3 neighbors, 20% seeds, 3 rounds: the graph is connected
      // enough in the fixture that propagation must reach nearly all
      assert(labeled >= (n * 9) / 10,
        s"only $labeled of $n non-seeds labeled after 3 rounds")
    } finally { nonSeed.unpersist(); () }
  }
}
