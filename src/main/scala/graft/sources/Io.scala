package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources/sinks — SURVEY.md §2.1.
  *
  * The reference delegates CSV to pandas (`/root/reference/baloo/io/
  * csv.py:6-87`: sep, header, names, usecols, dtype, skiprows, nrows);
  * here the same surface maps onto Spark's native distributed
  * readers/writers. Parquet is the primary format (columnar scan,
  * predicate pushdown, column pruning); CSV is the compatibility path.
  *
  * Scale notes: `bucketedParquet` writes bucketBy(key) so repeated
  * big-table joins/aggregations on that key skip their shuffle entirely
  * — the co-located-join strategy SURVEY §7 calls for at 100 TB.
  * Writers never coalesce: output parallelism = partition count.
  */
object Io {

  /** `read_csv` (csv.py:6-52): header/sep/schema/column-subset/nrows/
    * skiprows. `skiprows` drops the first N physical lines BEFORE header
    * parsing (the pandas "skip preamble junk" shape, csv.py:16,39) — it
    * reads the file as ordered text and feeds the remainder to the CSV
    * parser, so it is meaningful for single-file compatibility reads
    * (multi-file globs have no global "first line"; pandas never sees
    * them). The reference's `converters` kwarg (arbitrary Python
    * callables applied per column, csv.py:16) is N/A here — post-read
    * `withColumn` expressions are the Spark-native equivalent.
    */
  def readCsv(spark: SparkSession, path: String,
      sep: String = ",", header: Boolean = true,
      schema: Option[StructType] = None, names: Seq[String] = Nil,
      usecols: Seq[String] = Nil, nrows: Option[Int] = None,
      skiprows: Int = 0): DataFrame = {
    var r = spark.read
      .option("sep", sep)
      .option("header", header.toString)
    r = schema.map(r.schema).getOrElse(r.option("inferSchema", "true"))
    var df =
      if (skiprows <= 0) r.csv(path)
      else {
        // zipWithIndex costs one partition-count pass; line order within
        // a single file follows its splits, so indices are file order.
        import spark.implicits._
        val lines = spark.read.textFile(path).rdd.zipWithIndex()
          .filter(_._2 >= skiprows.toLong).map(_._1)
        r.csv(spark.createDataset(lines))
      }
    if (names.nonEmpty) df = df.toDF(names: _*)
    if (usecols.nonEmpty) df = df.select(usecols.head, usecols.tail: _*)
    nrows.map(df.limit).getOrElse(df)
  }

  /** `to_csv` (csv.py:56-87). */
  def writeCsv(df: DataFrame, path: String,
      sep: String = ",", header: Boolean = true): Unit =
    df.write.option("sep", sep).option("header", header.toString)
      .mode("overwrite").csv(path)

  /** JSON-lines read; pass `schema` for exact types (inference widens
    * and alphabetizes).
    */
  def readJson(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.map(r.schema).getOrElse(r).json(path)
  }

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Bucketed + sorted parquet table: joins/groupBys on `key` against
    * another table bucketed the same way are shuffle-free.
    */
  def bucketedParquet(df: DataFrame, table: String, key: String,
      buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Small-file compaction: rewrite a fragmented dataset as
    * `targetFiles` range-partitioned, internally-sorted parquet files,
    * each capped at `maxRecordsPerFile` rows. Range partitioning keeps
    * the sort key clustered (min/max row-group stats stay selective —
    * the data-skipping complement to `bucketedParquet`'s join layout),
    * and the per-file cap is Spark's own split point so one oversized
    * range can't produce a monster file. At 100 TB this is the
    * periodic maintenance job that keeps scan task counts proportional
    * to data, not to ingest batch count.
    */
  def compactedParquet(df: DataFrame, path: String, rangeCol: String,
      targetFiles: Int, maxRecordsPerFile: Long = 0L): Unit =
    df.repartitionByRange(targetFiles, org.apache.spark.sql.functions.col(rangeCol))
      .sortWithinPartitions(rangeCol)
      .write.option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite").parquet(path)
}
