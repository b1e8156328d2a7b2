package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.prep(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r")
      r
    }
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val P = 2147483647L
    val idxD = Tables.documents(spark, dir)
      .repartition(32)
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingles", expr(
        """CASE WHEN size(words) >= 3
          |  THEN transform(sequence(0, size(words) - 3),
          |    i -> concat_ws(' ', element_at(words, i + 1),
          |           element_at(words, i + 2), element_at(words, i + 3)))
          |  ELSE array(text) END""".stripMargin))
      .withColumn("dsh", array_distinct(col("shingles")))
      .select(col("doc_id"), size(col("dsh")).cast("long").as("n"),
        explode(col("dsh")).as("sg"))
      .select(col("doc_id"), col("n"),
        expr(s"CAST(conv(substring(md5(sg), 1, 15), 16, 10) AS BIGINT) % $P").as("h"))
      .dropDuplicates("doc_id", "h")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("materialize idxD")(idxD.count())
    time("docs")(idxD.select("doc_id").distinct().count())
    val dfCounts = idxD.groupBy("h").agg(count(lit(1)).as("df"))
    time("dfCounts")(dfCounts.count())
    time("df>1 hashes")(dfCounts.filter(col("df") > 1).count())
    time("max df")(dfCounts.agg(max("df")).collect()(0).getLong(0))
    val withDf = idxD.join(dfCounts, "h")
    val ranked = withDf.withColumn("r",
      row_number().over(Window.partitionBy("doc_id").orderBy(col("df"), col("h"))))
    val prefix = ranked
      .filter(col("r") <= col("n") - ceil(col("n") * 0.5) + 1)
      .select("doc_id", "h").persist()
    time("prefix rows")(prefix.count())
    val pairs = prefix.as("x").join(prefix.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct().persist()
    time("candidate pairs")(pairs.count())
    val ic = pairs
      .join(idxD.select(col("doc_id").as("doc_a"), col("h"), col("n").as("na")), "doc_a")
    time("expand a rows")(ic.count())
    val ic2 = ic.join(idxD.select(col("doc_id").as("doc_b"), col("h"), col("n").as("nb")),
        Seq("doc_b", "h"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"),
        first(col("na")).as("na"), first(col("nb")).as("nb"))
    time("interCounts")(ic2.count())
    time("final")(ic2.withColumn("j", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("j") >= 0.5).count())
    spark.stop()
  }
}
