package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant specs for the embedding-suite queries added round 4:
  * one-iteration k-means and the all-vectors kNN graph.
  */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("kmeans_iter: every vector assigned exactly once; members partition the corpus") {
    val out = Similarity.qKmeansIter(spark, dir).cache()
    try {
      // n_members is constant across dims within a cluster
      val perCluster = out.groupBy("cid")
        .agg(countDistinct(col("n_members")).as("d"),
          first(col("n_members")).as("m"),
          count(lit(1)).as("dims"))
        .collect()
      assert(perCluster.forall(_.getAs[Long]("d") == 1L))
      assert(perCluster.forall(_.getAs[Long]("dims") == 64L))
      // memberships partition the corpus: Σ members = corpus size
      val total = perCluster.map(_.getAs[Long]("m")).sum
      val corpus = graft.Tables.embeddings(spark, dir).count()
      assert(total == corpus, s"members $total != corpus $corpus")
    } finally { out.unpersist(); () }
  }

  test("argmax assignment is a hash aggregate: no Window in kmeans; only the rank window in IVF") {
    // the centroid assignment must be a max_by aggregate with map-side
    // partials, not a per-vector row_number sort window
    val kmPlan = Similarity.qKmeansIter(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!kmPlan.contains("Window"),
      s"kmeans assignment must not plan a Window:\n$kmPlan")
    val ivfPlan = Similarity.qEmbedIvf(spark, dir)
      .queryExecution.executedPlan.toString
    // the only Window left is the final per-query top-5 ranking
    val windows = "\\bWindow\\b".r.findAllIn(ivfPlan).size
    assert(windows <= 1,
      s"IVF should have at most the final rank window, found $windows:\n$ivfPlan")
  }

  test("hybrid near-dup plans a band equi-join, never an all-pairs block join") {
    val df = Similarity.qDedupEmbedHybrid(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"hybrid must not cross-join:\n$plan")
    // the blocked all-pairs leg explodes block-cell ids; the hybrid
    // must not — its only explode-like op is the band stack generator
    assert(!plan.contains("cell"),
      s"hybrid must not use the block-cell replication:\n$plan")
    // every planted pair is recovered: one pair per 5th original vector
    val n = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 5 === 0).count()
    val out = df.collect()
    assert(out.length == n, s"expected $n planted pairs, got ${out.length}")
    // each is (v, v + 1_000_000) at cosine ≥ the planted bound
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + 1000000L)
      assert(r.getDouble(2) >= 0.98)
    }
  }

  test("knn_graph: contiguous ranks 1..k per vector, cosines within [-1, 1] + quantization slack") {
    val out = Similarity.qKnnGraph(spark, dir).cache()
    try {
      val byQid = out.groupBy("qid")
        .agg(count(lit(1)).as("n"), max(col("rank")).as("maxr"),
          min(col("rank")).as("minr"), max(col("cos")).as("maxc"),
          min(col("cos")).as("minc"))
        .collect()
      byQid.foreach { r =>
        assert(r.getAs[Long]("n") <= 3L)
        assert(r.getAs[Int]("minr") == 1)
        assert(r.getAs[Long]("n") == r.getAs[Int]("maxr").toLong) // contiguous
        assert(r.getAs[Double]("maxc") <= 1.0 + 1e-9)
        assert(r.getAs[Double]("minc") >= -1.0 - 1e-9)
      }
      // the graph covers vectors that share at least one LSH bucket —
      // on this corpus that is everyone
      assert(byQid.length.toLong == graft.Tables.embeddings(spark, dir).count())
    } finally { out.unpersist(); () }
  }

  test("semantic dedup: verdicts match a brute-force SemDeDup replay") {
    val out = Similarity.qDedupSemantic(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        (r.getAs[Long]("cid"), r.getAs[Double]("ccos"), r.getAs[Boolean]("dropped"))))
      .toMap
    // brute-force replay on the driver from raw embeddings: argmax-cos
    // assignment to the 16 seed centroids, within-cluster pairwise
    // cosine, drop = some same-cluster neighbor ≥ τ sits ahead in
    // (centroid-cos, id) order
    val vecs = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding")
          // Spark's round() is half-AWAY-FROM-ZERO; math.round is half-up
          // (toward +∞) — they differ on negative components
          .map { x =>
            val y = x.toDouble * 1048576.0
            (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
          }.toArray)
      .sortBy(_._1)
    def dot(a: Array[Long], b: Array[Long]): Double =
      a.indices.map(i => a(i) * b(i)).sum.toDouble
    def cos(a: Array[Long], b: Array[Long]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val cents = vecs.filter(_._1 < 16)
    val assigned = vecs.map { case (id, v) =>
      val (cid, ccos) = cents.map { case (c, cv) => (c, cos(v, cv)) }
        .maxBy { case (c, cc) => (cc, -c) }
      (id, v, cid, ccos)
    }
    val byCluster = assigned.groupBy(_._3)
    assigned.foreach { case (id, v, cid, ccos) =>
      val dropped = byCluster(cid).exists { case (oid, ov, _, occos) =>
        oid != id && cos(v, ov) >= 0.40 &&
          (occos < ccos || (occos == ccos && oid < id))
      }
      assert(out(id) == ((cid, ccos, dropped)), s"vec $id mismatch")
    }
    // the pair join must be cluster-keyed (equi-join on cid), never a
    // corpus×corpus cartesian; the only nested-loop join allowed is the
    // 16-row broadcast centroid assignment
    val plan = Similarity.qDedupSemantic(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"semantic dedup must not plan a cartesian pair join:\n$plan")
  }

  test("hard negatives: picks come from the graph, labels disagree/agree, margin is hp−hn") {
    val g = Similarity.qKnnGraph(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vid")) -> r.getAs[Double]("cos"))
      .toMap
    val labels = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Number]("label").longValue).toMap
    val rows = Similarity.qHardNegatives(spark, dir).collect()
    assert(rows.length == labels.size)
    rows.foreach { r =>
      val q = r.getAs[Long]("vec_id")
      val neighbors = g.keys.filter(_._1 == q).map(_._2).toSet
      if (!r.isNullAt(r.fieldIndex("hn_vid"))) {
        val hn = r.getAs[Long]("hn_vid")
        assert(neighbors.contains(hn), s"hn of $q not a graph neighbor")
        assert(labels(hn) != labels(q), s"hn of $q shares its label")
        // it is the BEST different-label neighbor: none ranks above it
        val better = neighbors.filter(v => labels(v) != labels(q)).exists { v =>
          val c = g((q, v)); val hc = g((q, hn))
          c > hc || (c == hc && v < hn)
        }
        assert(!better, s"hn of $q is not the top different-label neighbor")
      } else assert(!neighbors.exists(v => labels(v) != labels(q)))
      if (!r.isNullAt(r.fieldIndex("hp_vid"))) {
        val hp = r.getAs[Long]("hp_vid")
        assert(labels(hp) == labels(q), s"hp of $q has a different label")
      }
      if (!r.isNullAt(r.fieldIndex("margin"))) {
        val m = r.getAs[Double]("margin")
        assert(m == g((q, r.getAs[Long]("hp_vid"))) - g((q, r.getAs[Long]("hn_vid"))))
      }
    }
  }

  test("graph triangles: counts match a driver replay; no cartesian in the plan") {
    // undirected edge set from the graph output
    val edges = Similarity.qKnnGraph(spark, dir).collect()
      .map { r =>
        val (a, b) = (r.getAs[Long]("qid"), r.getAs[Long]("vid"))
        (math.min(a, b), math.max(a, b))
      }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
    def triOf(v: Long): Long = {
      val ns = adj.getOrElse(v, Set.empty).toSeq
      ns.combinations(2).count { case Seq(x, y) =>
        edges.contains((math.min(x, y), math.max(x, y)))
      }.toLong
    }
    val rows = Similarity.qGraphTriangles(spark, dir).collect()
    rows.foreach { r =>
      val v = r.getAs[Long]("vec_id")
      val deg = adj.getOrElse(v, Set.empty).size.toLong
      assert(r.getAs[Long]("degree") == deg, s"degree of $v")
      assert(r.getAs[Long]("n_triangles") == triOf(v), s"triangles of $v")
      val cc = r.getAs[Double]("clustering_coeff")
      if (deg >= 2) assert(cc == triOf(v) * 2.0 / (deg * (deg - 1)))
      else assert(cc == 0.0)
    }
    val plan = Similarity.qGraphTriangles(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"triangle count must join on vertex ids, not cross:\n$plan")
  }

  test("PQ ANN: 5 ranked hits per query, non-negative non-decreasing distances") {
    val rows = Similarity.qEmbedPq(spark, dir).collect()
    val byQid = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQid.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQid.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val dists = sorted.map(_.getAs[Long]("dist"))
      assert(dists.forall(_ >= 0L))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    }
  }

  test("walk mass: total mass conserved at n·6^rounds; all masses non-negative") {
    val out = Similarity.qWalkMass(spark, dir).collect()
    val n = graft.Tables.embeddings(spark, dir).count()
    val total = out.map(_.getAs[Long]("mass")).sum
    assert(total == n * 216L, s"mass not conserved: $total != ${n * 216L}")
    assert(out.forall(_.getAs[Long]("mass") >= 0L))
    assert(out.length == n)
  }

  test("decontaminate_embed: survivors ≡ brute-force eval-cosine threshold; eval side broadcast") {
    val df = Similarity.qDecontaminateEmbed(spark, dir)
    val out = df.collect().map(_.getAs[Long]("vec_id")).toSet
    // Brute-force replay with the SAME quantization (HALF_UP round, as
    // Spark's `round` and DuckDB's `round` both do).
    def quant(x: Float): Long =
      BigDecimal(x.toDouble * 1048576.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val emb = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(quant).toArray)
    def n2(v: Array[Long]): Long = v.map(x => x * x).sum
    def cos(a: Array[Long], b: Array[Long]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum.toDouble /
        (math.sqrt(n2(a).toDouble) * math.sqrt(n2(b).toDouble))
    val evals = emb.filter(_._1 < 20)
    val expect = emb.filter(_._1 >= 20).collect {
      case (id, v) if !evals.exists { case (_, e) => cos(v, e) >= 0.35 } => id
    }.toSet
    assert(out == expect, s"survivor sets differ: ${out.diff(expect)} / ${expect.diff(out)}")
    // Scale shape: the eval set broadcasts; no non-broadcast cartesian.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"eval side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"corpus side must not shuffle into a cartesian:\n$plan")
  }
}
