package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.prep(spark)
    for (name <- Seq("q_dedup_jaccard", "q_iloc", "q_embed_ivf")) {
      println(s"=== PLAN $name")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString)
      println(s"=== END $name")
    }
    spark.stop()
  }
}
