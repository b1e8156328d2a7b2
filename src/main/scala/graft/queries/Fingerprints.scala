package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-pipeline near-duplicate detection over `documents`: MinHash+LSH,
  * SimHash, and n-gram Jaccard — the dedup suite's probabilistic legs.
  *
  * All hashing is integer arithmetic seeded from md5 (identical on any
  * engine), so every query here has a full value-exact DuckDB oracle —
  * no "rows-only" cop-out. Base hash: first 15 hex chars of md5 → 60-bit
  * non-negative bigint.
  *
  * Scale design (the whole point of these over exact dedup):
  *  - MinHash: per-doc signature is one pass over shingles (map-only);
  *    candidate generation joins on (band, bandValue) — shuffle keys are
  *    16-byte-ish ints, never document text. O(n) + join on collisions.
  *  - SimHash: 48-bit fingerprint per doc (map-only); the pigeonhole
  *    chunk-join (4×12-bit chunks) finds ALL pairs with hamming ≤ 3
  *    without an O(n²) cross join — a pair with ≤3 differing bits must
  *    agree exactly on ≥1 chunk.
  *  - Jaccard: inverted index (explode distinct shingles → self-join on
  *    shingle → pair-count) — candidate pairs are only those sharing a
  *    shingle, which is exactly the J>0 set.
  */
object Fingerprints extends QueryModule {

  private val P = 2147483647L // 2^31 − 1
  private def A(j: Int): Long = (2654435761L * (j + 1)) % P
  private def B(j: Int): Long = (1013904223L * (j + 1)) % P
  private val NumHashes = 16
  private val NumBands = 8 // bands of 2 hashes

  /** Spark-side doc → words/shingles/shingle-hashes. */
  private def withShingleHashes(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingles", expr(
        """CASE WHEN size(words) >= 3
          |  THEN transform(sequence(0, size(words) - 3),
          |    i -> concat_ws(' ', element_at(words, i + 1),
          |           element_at(words, i + 2), element_at(words, i + 3)))
          |  ELSE array(text) END""".stripMargin))
      .withColumn("hs", expr(
        s"transform(shingles, s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) % $P)"))

  /** MinHash signatures + LSH banding → candidate near-dup pairs. */
  def qDedupMinhash(s: SparkSession, dir: String): DataFrame = {
    val sigCols = (0 until NumHashes).map(j =>
      expr(s"array_min(transform(hs, x -> (${A(j)} * x + ${B(j)}) % $P))").as(s"sig$j"))
    val sigs = withShingleHashes(s, dir)
      .select(col("doc_id") +: sigCols: _*)
    val bandCols = (0 until NumBands).map(b =>
      (col(s"sig${2 * b}") * P + col(s"sig${2 * b + 1}")).as(s"band$b"))
    val stackArgs = (0 until NumBands).map(b => s"$b, band$b").mkString(", ")
    val bands = sigs.select(col("doc_id") +: bandCols: _*)
      .selectExpr("doc_id", s"stack($NumBands, $stackArgs) AS (band, v)")
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** 48-bit SimHash fingerprint per document (majority vote per bit over
    * word hashes).
    */
  /** SimHash via explode + two codegen'd hash aggregates (not nested
    * higher-order folds, which Spark evaluates interpreted — 10×+
    * slower): word-hash rows × 48 bit positions → per-(doc, bit) vote
    * sums → per-doc fingerprint. Every operator whole-stage-codegens and
    * partial-aggregates map-side; the same plan shape carries to any
    * corpus size.
    */
  private def withSimhash(s: SparkSession, dir: String): DataFrame = {
    val wordHashes = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"),
        expr("CAST(conv(substring(md5(w), 1, 12), 16, 10) AS BIGINT)").as("h"))
    val votes = wordHashes
      .select(col("doc_id"), col("h"), explode(expr("sequence(0, 47)")).as("b"))
      .groupBy("doc_id", "b")
      .agg(sum(when(expr("(shiftright(h, b) & 1) = 1"), 1L).otherwise(-1L)).as("v"))
    votes.groupBy("doc_id")
      .agg(sum(when(col("v") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L)).as("simhash"))
  }

  def qFingerprintSimhash(s: SparkSession, dir: String): DataFrame =
    withSimhash(s, dir).select("doc_id", "simhash").orderBy("doc_id")

  /** SimHash near-dup pairs (hamming ≤ 3) via the 4-chunk pigeonhole
    * join — result is provably identical to the brute-force cross join
    * the oracle runs.
    */
  def qDedupSimhash(s: SparkSession, dir: String): DataFrame = {
    // withSimhash ends in an aggregation exchange, so the fingerprint is
    // materialized once per doc before the self-join fans out pairs.
    val sim = withSimhash(s, dir).select("doc_id", "simhash")
    val chunkArgs = (0 until 4).map(c =>
      s"$c, (shiftright(simhash, ${c * 12}) & 4095)").mkString(", ")
    val chunks = sim.selectExpr("doc_id", "simhash", s"stack(4, $chunkArgs) AS (chunk, v)")
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.v") === col("y.v")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(expr("x.simhash ^ y.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** n-gram (3-word shingle) Jaccard near-dup pairs via inverted index. */
  def qDedupJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = withShingleHashes(s, dir)
      .select(col("doc_id"), explode(array_distinct(col("shingles"))).as("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("j", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("j") >= 0.5)
      .select("doc_a", "doc_b", "j")
      .orderBy("doc_a", "doc_b")
  }

  /** End-to-end dedup pipeline — the composition a real corpus clean
    * runs: MinHash/LSH candidate pairs (cheap, O(n)+collisions) →
    * exact-Jaccard confirmation ONLY on candidates (the expensive check
    * touches ~|candidates|, never n²) → survivor set = drop the higher
    * doc_id of every confirmed pair. Returns surviving docs.
    */
  def qDedupPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = withShingleHashes(s, dir)
      .select(col("doc_id"), array_distinct(col("shingles")).as("sh"))
    val candidates = qDedupMinhash(s, dir) // (doc_a, doc_b) pairs
    val confirmed = candidates
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("j", col("inter")
        / (size(col("sha")) + size(col("shb")) - col("inter")))
      .filter(col("j") >= 0.5)
    val removed = confirmed.select(col("doc_b").as("doc_id")).distinct()
    Tables.documents(s, dir).select("doc_id", "lang", "source")
      .join(removed, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_pipeline" -> (qDedupPipeline(_, _)),
    "q_dedup_minhash" -> (qDedupMinhash(_, _)),
    "q_fingerprint_simhash" -> (qFingerprintSimhash(_, _)),
    "q_dedup_simhash" -> (qDedupSimhash(_, _)),
    "q_dedup_jaccard" -> (qDedupJaccard(_, _)))

  // ---- DuckDB oracle SQL (same integer algorithms, brute-force where
  // that is simpler — provably the same result set) ----

  private val sqlShingles =
    """CASE WHEN len(string_split(text, ' ')) >= 3
      |  THEN list_transform(range(0, len(string_split(text, ' ')) - 2),
      |    i -> string_split(text, ' ')[i + 1] || ' ' ||
      |         string_split(text, ' ')[i + 2] || ' ' ||
      |         string_split(text, ' ')[i + 3])
      |  ELSE [text] END""".stripMargin

  private val sqlHs =
    s"list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % $P)"

  private val sqlSimhash =
    """list_sum(list_transform(range(0, 48), b ->
      |  CASE WHEN list_sum(list_transform(ths,
      |      x -> CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
      |    THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))""".stripMargin

  /** Shared CTE chain: documents → shingles → minhash sigs → LSH band
    * candidate pairs (no trailing ORDER BY, embeddable).
    */
  private def sqlMinhashCtes: String = {
    val sigSelects = (0 until NumHashes).map(j =>
      s"list_min(list_transform(hs, x -> (${A(j)} * x + ${B(j)}) % $P)) AS sig$j").mkString(",\n  ")
    val bandSelects = (0 until NumBands).map(b =>
      s"SELECT doc_id, $b AS band, sig${2 * b} * $P + sig${2 * b + 1} AS v FROM sigs")
      .mkString("\n  UNION ALL ")
    s"""WITH shingled AS (SELECT doc_id, $sqlShingles AS sh FROM documents),
       |hashed AS (SELECT doc_id, $sqlHs AS hs FROM shingled),
       |sigs AS (SELECT doc_id,
       |  $sigSelects
       |FROM hashed),
       |bands AS (
       |  $bandSelects),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_dedup_minhash" ->
      s"""$sqlMinhashCtes
         |SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b""".stripMargin,
    "q_dedup_pipeline" ->
      s"""$sqlMinhashCtes,
         |dsh AS (SELECT doc_id, list_distinct($sqlShingles) AS sh FROM documents),
         |confirmed AS (
         |  SELECT p.doc_a, p.doc_b
         |  FROM pairs p
         |  JOIN dsh a ON a.doc_id = p.doc_a
         |  JOIN dsh b ON b.doc_id = p.doc_b
         |  WHERE len(list_intersect(a.sh, b.sh))
         |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
         |removed AS (SELECT DISTINCT doc_b AS doc_id FROM confirmed)
         |SELECT d.doc_id, d.lang, d.source FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM removed)
         |ORDER BY d.doc_id""".stripMargin,
    "q_fingerprint_simhash" ->
      s"""WITH t AS (SELECT doc_id,
         |  list_transform(string_split(text, ' '),
         |    w -> ('0x' || substr(md5(w), 1, 12))::BIGINT) AS ths
         |FROM documents)
         |SELECT doc_id, $sqlSimhash AS simhash FROM t ORDER BY doc_id""".stripMargin,
    "q_dedup_simhash" ->
      s"""WITH t AS (SELECT doc_id,
         |  list_transform(string_split(text, ' '),
         |    w -> ('0x' || substr(md5(w), 1, 12))::BIGINT) AS ths
         |FROM documents),
         |s AS (SELECT doc_id, $sqlSimhash AS simhash FROM t)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
         |FROM s a, s b
         |WHERE a.doc_id < b.doc_id
         |  AND bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q_dedup_jaccard" ->
      s"""WITH s AS (SELECT doc_id,
         |  list_distinct($sqlShingles) AS sh FROM documents)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  len(list_intersect(a.sh, b.sh))
         |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
         |FROM s a, s b
         |WHERE a.doc_id < b.doc_id
         |  AND len(list_intersect(a.sh, b.sh))
         |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin)
}
