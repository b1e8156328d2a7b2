package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-pipeline similarity search over `embeddings` (64-dim float
  * vectors): brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane-LSH bucketed variant as the scale path.
  *
  * Numeric determinism: per-vector norms fold through exact
  * DECIMAL(30,10) partial sums; all PAIRWISE math (dot products for
  * knn/ann/dedup) runs on 2^20-quantized BIGINT vectors — exact long
  * arithmetic, an order of magnitude cheaper than interpreted decimal
  * folds and bit-identical on any engine. Cosines are then one double
  * expression over identical integer scalars.
  *
  * Scale design:
  *  - brute-force is O(|Q|·N) with a broadcast of the query set — right
  *    answer for small query batches, never for all-pairs;
  *  - the LSH variant buckets vectors by sign patterns against fixed
  *    hyperplanes, so candidate generation is an equi-join on the bucket
  *    id — a shuffle on a small integer key instead of a cross join.
  *    More planes/band-OR repetitions trade recall for bucket size;
  *    the skeleton here (4 planes, 16 buckets) is the structure, sized
  *    for the test data.
  */
object Similarity extends QueryModule {

  /** Exact decimal fold of `elemExpr(i)` over dims 0..63 → double. */
  private def decSum(elemExpr: String): String =
    s"""CAST(aggregate(
       |  transform(sequence(0, 63), i -> CAST(($elemExpr) AS DECIMAL(30,10))),
       |  CAST(0 AS DECIMAL(30,10)),
       |  (acc, x) -> CAST(acc + x AS DECIMAL(30,10))) AS DOUBLE)""".stripMargin

  private def sqlDecSum(elemExpr: String): String =
    s"""CAST(list_sum(list_transform(range(0, 64),
       |    i -> CAST(($elemExpr) AS DECIMAL(30,10)))) AS DOUBLE)""".stripMargin

  /** ±1 hyperplane component for plane j, dim i — a fixed arithmetic
    * pseudo-random pattern spellable identically in any SQL dialect.
    */
  private def plane(j: Int): String =
    s"(CASE WHEN ((i * (${j + 3})) % 7) < 4 THEN 1.0 ELSE -1.0 END)"

  private val normExpr = decSum(
    "CAST(element_at(embedding, i + 1) AS DOUBLE) * CAST(element_at(embedding, i + 1) AS DOUBLE)")
  private val sqlNormExpr = sqlDecSum(
    "CAST(embedding[i + 1] AS DOUBLE) * CAST(embedding[i + 1] AS DOUBLE)")

  /** Per-vector norms — the array-arithmetic primitive. */
  def qEmbedNorms(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        expr(normExpr).as("norm2"),
        sqrt(expr(normExpr)).as("norm"))
      .orderBy("vec_id")

  private def dotExpr(a: String, b: String): String =
    decSum(s"CAST(element_at($a, i + 1) AS DOUBLE) * CAST(element_at($b, i + 1) AS DOUBLE)")

  /** Quantize a float vector to exact 2^20-scaled BIGINTs — one map-side
    * pass per vector. Pairwise math then runs in long arithmetic
    * (codegen-cheap, bit-identical on any engine) instead of per-pair
    * interpreted decimal folds; the ~1e-6 quantization error is
    * irrelevant at a 0.4 threshold / rank comparison because BOTH
    * engines rank the same exact integers.
    */
  private val qvecExpr =
    "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))"
  private val qnormExpr =
    "aggregate(transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)), CAST(0 AS BIGINT), (acc, v) -> acc + v * v)"
  private def qdotExpr(a: String, b: String): String =
    s"CAST(aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE)"
  private def qcos(dot: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    dot / (sqrt(col("qn2").cast("double")) * sqrt(col("vn2").cast("double")))

  /** Brute-force cosine top-10 for query vectors vec_id < 5. The query
    * side is broadcast; ranking is a per-query-partitioned window.
    */
  def qEmbedKnn(s: SparkSession, dir: String): DataFrame = {
    // repartition = exchange barrier: quantized vectors are materialized
    // once per vector, not re-inlined into every joined pair by
    // CollapseProject.
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), expr(qvecExpr).as("qv"), expr(qnormExpr).as("n2"))
      .repartition(col("vec_id"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("qv").as("qe"), col("n2").as("qn2"))
    val cos = broadcast(q).crossJoin(emb.select(col("vec_id").as("vid"),
        col("qv").as("ve"), col("n2").as("vn2")))
      .filter(col("qid") =!= col("vid"))
      .withColumn("cos", qcos(expr(qdotExpr("qe", "ve"))))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid").asc)
    cos.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select("qid", "vid", "cos", "rank")
      .orderBy("qid", "rank")
  }

  /** LSH-bucketed ANN: 4 fixed hyperplanes → 16 sign buckets; candidates
    * share the query's bucket (equi-join on bucket id), ranked by exact
    * cosine, top-5.
    */
  def qEmbedAnn(s: SparkSession, dir: String): DataFrame = {
    def bit(j: Int): Column =
      when(expr(decSum(
        s"${plane(j)} * CAST(element_at(embedding, i + 1) AS DOUBLE)")) > 0.0, 1).otherwise(0)
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), expr(qvecExpr).as("qv"), expr(qnormExpr).as("n2"),
        (bit(0) + bit(1) * 2 + bit(2) * 4 + bit(3) * 8).as("bucket"))
      .repartition(col("vec_id"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("qv").as("qe"),
        col("n2").as("qn2"), col("bucket"))
    val cand = broadcast(q).join(
        emb.select(col("vec_id").as("vid"), col("qv").as("ve"),
          col("n2").as("vn2"), col("bucket")),
        Seq("bucket"))
      .filter(col("qid") =!= col("vid"))
      .withColumn("cos", qcos(expr(qdotExpr("qe", "ve"))))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("qid", "vid", "bucket", "cos", "rank")
      .orderBy("qid", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with cos ≥ 0.40
    * (the testdata's vectors are near-orthogonal — max pairwise cos
    * ≈ 0.51 — so a production-style 0.95 threshold would be vacuous),
    * via the same exact arithmetic (dedup suite's embedding leg).
    */
  def qDedupEmbed(s: SparkSession, dir: String): DataFrame = {
    // All-pairs dot products as explode → dim-join → hash aggregate:
    // every operator whole-stage-codegens (a per-pair higher-order fold
    // would run interpreted, ~5× slower here), partial sums combine
    // map-side, and the same plan shape survives any corpus size —
    // with an LSH/bucket prefilter replacing the all-pairs dim join once
    // n² pairs is the bottleneck.
    val elems = Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(expr(qvecExpr)).as(Seq("i", "v")))
    // Explicit partition count: the dim-join INPUT is tiny (n·d rows) so
    // AQE would coalesce it to ~1 partition, but its OUTPUT is n²·d/p
    // rows per partition — pin p so the explosion stays parallel.
    val a = elems.select(col("vec_id").as("ida"), col("i"), col("v").as("va"))
      .repartition(32, col("i"))
    val b = elems.select(col("vec_id").as("idb"), col("i"), col("v").as("vb"))
      .repartition(32, col("i"))
    val dots = a.join(b, Seq("i")).filter(col("ida") < col("idb"))
      .groupBy("ida", "idb").agg(sum(col("va") * col("vb")).as("dot"))
    val norms = elems.groupBy("vec_id").agg(sum(col("v") * col("v")).as("n2"))
    dots
      .join(norms.select(col("vec_id").as("ida"), col("n2").as("qn2")), "ida")
      .join(norms.select(col("vec_id").as("idb"), col("n2").as("vn2")), "idb")
      .withColumn("cos", qcos(col("dot").cast("double")))
      .filter(col("cos") >= 0.40)
      .select("ida", "idb", "cos")
      .orderBy("ida", "idb")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_norms" -> (qEmbedNorms(_, _)),
    "q_embed_knn" -> (qEmbedKnn(_, _)),
    "q_embed_ann" -> (qEmbedAnn(_, _)),
    "q_dedup_embed" -> (qDedupEmbed(_, _)))

  private def sqlDot(a: String, b: String): String =
    sqlDecSum(s"CAST($a[i + 1] AS DOUBLE) * CAST($b[i + 1] AS DOUBLE)")

  // DuckDB spellings of the integer-quantized vector math.
  private val sqlQvec =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))"
  private val sqlQnorm =
    s"CAST(list_sum(list_transform($sqlQvec, v -> v * v)) AS BIGINT)"
  private def sqlQdot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(0, 64), i -> $a[i + 1] * $b[i + 1])) AS DOUBLE)"
  private def sqlQcos(a: String, b: String, n2a: String, n2b: String): String =
    s"${sqlQdot(a, b)} / (sqrt(CAST($n2a AS DOUBLE)) * sqrt(CAST($n2b AS DOUBLE)))"

  val oracleSql: Map[String, String] = Map(
    "q_embed_norms" ->
      s"""SELECT vec_id,
         |  CAST(len(embedding) AS INTEGER) AS dim,
         |  $sqlNormExpr AS norm2,
         |  sqrt($sqlNormExpr) AS norm
         |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_embed_knn" ->
      s"""WITH e AS (SELECT vec_id, $sqlQvec AS qv, $sqlQnorm AS n2 FROM embeddings),
         |c AS (
         |  SELECT q.vec_id AS qid, v.vec_id AS vid,
         |    ${sqlQcos("q.qv", "v.qv", "q.n2", "v.n2")} AS cos
         |  FROM e q, e v
         |  WHERE q.vec_id < 5 AND q.vec_id <> v.vec_id),
         |r AS (SELECT qid, vid, cos,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid ASC) AS INTEGER) AS rank
         |  FROM c)
         |SELECT qid, vid, cos, rank FROM r WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin,
    "q_embed_ann" ->
      s"""WITH e AS (
         |  SELECT vec_id, $sqlQvec AS qv, $sqlQnorm AS n2,
         |    (CASE WHEN ${sqlDecSum(s"${plane(0)} * CAST(embedding[i + 1] AS DOUBLE)")} > 0.0 THEN 1 ELSE 0 END)
         |    + 2 * (CASE WHEN ${sqlDecSum(s"${plane(1)} * CAST(embedding[i + 1] AS DOUBLE)")} > 0.0 THEN 1 ELSE 0 END)
         |    + 4 * (CASE WHEN ${sqlDecSum(s"${plane(2)} * CAST(embedding[i + 1] AS DOUBLE)")} > 0.0 THEN 1 ELSE 0 END)
         |    + 8 * (CASE WHEN ${sqlDecSum(s"${plane(3)} * CAST(embedding[i + 1] AS DOUBLE)")} > 0.0 THEN 1 ELSE 0 END)
         |    AS bucket
         |  FROM embeddings),
         |c AS (
         |  SELECT q.vec_id AS qid, v.vec_id AS vid, q.bucket AS bucket,
         |    ${sqlQcos("q.qv", "v.qv", "q.n2", "v.n2")} AS cos
         |  FROM e q JOIN e v ON q.bucket = v.bucket
         |  WHERE q.vec_id < 5 AND q.vec_id <> v.vec_id),
         |r AS (SELECT qid, vid, bucket, cos,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid ASC) AS INTEGER) AS rank
         |  FROM c)
         |SELECT qid, vid, bucket, cos, rank FROM r WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    "q_dedup_embed" ->
      s"""WITH e AS (SELECT vec_id, $sqlQvec AS qv, $sqlQnorm AS n2 FROM embeddings)
         |SELECT a.vec_id AS ida, b.vec_id AS idb,
         |  ${sqlQcos("a.qv", "b.qv", "a.n2", "b.n2")} AS cos
         |FROM e a, e b
         |WHERE a.vec_id < b.vec_id
         |  AND ${sqlQcos("a.qv", "b.qv", "a.n2", "b.n2")} >= 0.40
         |ORDER BY ida, idb""".stripMargin)
}
