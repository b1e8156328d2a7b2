package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-pipeline similarity search over `embeddings` (64-dim float
  * vectors): brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane-LSH bucketed variant as the scale path.
  *
  * Numeric determinism: every dot product / squared norm folds through
  * exact DECIMAL(30,10) partial sums (float×float products are exact in
  * double — 24-bit mantissas — and the decimal rounding + addition is
  * order-independent), then the cosine is one double expression over
  * identical scalars on both engines.
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

  /** Brute-force cosine top-10 for query vectors vec_id < 5. The query
    * side is broadcast; ranking is a per-query-partitioned window.
    */
  def qEmbedKnn(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), expr(normExpr).as("norm2"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("norm2").as("qn2"))
    val cos = broadcast(q).crossJoin(emb.select(col("vec_id").as("vid"),
        col("embedding").as("ve"), col("norm2").as("vn2")))
      .filter(col("qid") =!= col("vid"))
      .withColumn("cos",
        expr(dotExpr("qe", "ve")) / (sqrt(col("qn2")) * sqrt(col("vn2"))))
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
      .select(col("vec_id"), col("embedding"), expr(normExpr).as("norm2"),
        (bit(0) + bit(1) * 2 + bit(2) * 4 + bit(3) * 8).as("bucket"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("norm2").as("qn2"), col("bucket"))
    val cand = broadcast(q).join(
        emb.select(col("vec_id").as("vid"), col("embedding").as("ve"),
          col("norm2").as("vn2"), col("bucket")),
        Seq("bucket"))
      .filter(col("qid") =!= col("vid"))
      .withColumn("cos",
        expr(dotExpr("qe", "ve")) / (sqrt(col("qn2")) * sqrt(col("vn2"))))
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
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), expr(normExpr).as("norm2"))
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("qe"), col("norm2").as("qn2"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("ve"), col("norm2").as("vn2"))
    a.crossJoin(b).filter(col("ida") < col("idb"))
      .withColumn("cos",
        expr(dotExpr("qe", "ve")) / (sqrt(col("qn2")) * sqrt(col("vn2"))))
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

  val oracleSql: Map[String, String] = Map(
    "q_embed_norms" ->
      s"""SELECT vec_id,
         |  CAST(len(embedding) AS INTEGER) AS dim,
         |  $sqlNormExpr AS norm2,
         |  sqrt($sqlNormExpr) AS norm
         |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_embed_knn" ->
      s"""WITH e AS (SELECT vec_id, embedding, $sqlNormExpr AS norm2 FROM embeddings),
         |c AS (
         |  SELECT q.vec_id AS qid, v.vec_id AS vid,
         |    ${sqlDot("q.embedding", "v.embedding")}
         |      / (sqrt(q.norm2) * sqrt(v.norm2)) AS cos
         |  FROM e q, e v
         |  WHERE q.vec_id < 5 AND q.vec_id <> v.vec_id),
         |r AS (SELECT qid, vid, cos,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid ASC) AS INTEGER) AS rank
         |  FROM c)
         |SELECT qid, vid, cos, rank FROM r WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin,
    "q_embed_ann" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, $sqlNormExpr AS norm2,
         |    (CASE WHEN ${sqlDecSum(s"${plane(0)} * CAST(embedding[i + 1] AS DOUBLE)")} > 0.0 THEN 1 ELSE 0 END)
         |    + 2 * (CASE WHEN ${sqlDecSum(s"${plane(1)} * CAST(embedding[i + 1] AS DOUBLE)")} > 0.0 THEN 1 ELSE 0 END)
         |    + 4 * (CASE WHEN ${sqlDecSum(s"${plane(2)} * CAST(embedding[i + 1] AS DOUBLE)")} > 0.0 THEN 1 ELSE 0 END)
         |    + 8 * (CASE WHEN ${sqlDecSum(s"${plane(3)} * CAST(embedding[i + 1] AS DOUBLE)")} > 0.0 THEN 1 ELSE 0 END)
         |    AS bucket
         |  FROM embeddings),
         |c AS (
         |  SELECT q.vec_id AS qid, v.vec_id AS vid, q.bucket AS bucket,
         |    ${sqlDot("q.embedding", "v.embedding")}
         |      / (sqrt(q.norm2) * sqrt(v.norm2)) AS cos
         |  FROM e q JOIN e v ON q.bucket = v.bucket
         |  WHERE q.vec_id < 5 AND q.vec_id <> v.vec_id),
         |r AS (SELECT qid, vid, bucket, cos,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid ASC) AS INTEGER) AS rank
         |  FROM c)
         |SELECT qid, vid, bucket, cos, rank FROM r WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    "q_dedup_embed" ->
      s"""WITH e AS (SELECT vec_id, embedding, $sqlNormExpr AS norm2 FROM embeddings)
         |SELECT a.vec_id AS ida, b.vec_id AS idb,
         |  ${sqlDot("a.embedding", "b.embedding")}
         |    / (sqrt(a.norm2) * sqrt(b.norm2)) AS cos
         |FROM e a, e b
         |WHERE a.vec_id < b.vec_id
         |  AND ${sqlDot("a.embedding", "b.embedding")}
         |    / (sqrt(a.norm2) * sqrt(b.norm2)) >= 0.40
         |ORDER BY ida, idb""".stripMargin)
}
