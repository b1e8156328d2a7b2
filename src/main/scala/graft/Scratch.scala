package graft

import org.apache.spark.sql.SparkSession

/** Throwaway driver-contract smoke check (not part of the library
  * surface): entry() must return rows > 0 on sf0.001, and every
  * registered query must have an oracle entry.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.prep(spark)
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY rows=$n")
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"QUERIES=${q.size} ORACLES=${o.size} missing_oracle=${(q -- o).toSeq.sorted}")
    spark.stop()
  }
}
