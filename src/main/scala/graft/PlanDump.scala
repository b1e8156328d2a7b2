package graft

import org.apache.spark.sql.SparkSession

/** Prints the executed physical plan of named SparkEntry queries —
  * the evidence feed for docs/PLANS.md.
  *
  * Usage: runMain graft.PlanDump <sfDir> [query1,query2,...] [outDir suffix]
  * (no list → every registered query). With a 3rd arg, additionally
  * writes each query's `.explain("formatted")` output to
  * `<outDir>/<query>_<suffix>.txt` — the before/after evidence files
  * the optimization rounds commit under plans/rNN/ (outDir and suffix
  * split on the last ':', e.g. `plans/r13:before`).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).headOption.filter(_.nonEmpty).map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    // The ':' separating outDir from the filename suffix is required —
    // a bare/empty third arg would yield dir="" and make
    // createDirectories throw on a null parent (ADVICE r13).
    val outSpec = args.drop(2).headOption.filter(_.nonEmpty).map { spec =>
      val i = spec.lastIndexOf(':')
      require(i > 0, s"outSpec must be '<outDir>:<suffix>', got '$spec'")
      (spec.substring(0, i), "_" + spec.substring(i + 1))
    }
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
          val df = fn(spark, sfDir)
          println(s"## $n\n")
          println("```")
          println(df.queryExecution.executedPlan.toString.trim)
          println("```\n")
          outSpec.foreach { case (dir, suffix) =>
            val formatted = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val p = java.nio.file.Paths.get(dir, s"$n$suffix.txt")
            java.nio.file.Files.createDirectories(p.getParent)
            java.nio.file.Files.write(p, formatted.getBytes("UTF-8"))
          }
        case None => System.err.println(s"[plandump] unknown query: $n")
      }
    }
    spark.stop()
  }
}
