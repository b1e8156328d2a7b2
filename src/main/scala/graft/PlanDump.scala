package graft

import org.apache.spark.sql.SparkSession

/** Prints the executed physical plan of named SparkEntry queries —
  * the evidence feed for docs/PLANS.md.
  *
  * Usage: runMain graft.PlanDump <sfDir> [query1,query2,...]
  * (no list → every registered query).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).headOption.map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "4")
      // SPARK_GRAFT_BROADCAST=-1 disables broadcast joins, showing the
      // plan shape a too-big-to-broadcast build side forces at scale.
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BROADCAST", "10485760"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.prep(spark)
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"## $n\n")
          println("```")
          println(fn(spark, sfDir).queryExecution.executedPlan.toString.trim)
          println("```\n")
        case None => System.err.println(s"[plandump] unknown query: $n")
      }
    }
    spark.stop()
  }
}
