package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders over the driver-generated parquet testdata
  * (see /root/repo/TESTDATA.md). Every query in [[SparkEntry.queries]]
  * receives a scale-factor directory and reads through here, so filters
  * and projections compose directly onto the parquet scan (predicate
  * pushdown + column pruning reach the source).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Defensive session prep: oracle parity needs UTC + non-ANSI eval
    * (Spark 4 defaults ANSI on; the reference's semantics — and DuckDB's
    * behavior on e.g. out-of-range element_at — match the permissive mode).
    */
  def prep(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    prep(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
