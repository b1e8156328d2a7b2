package graft

import org.apache.spark.sql.SparkSession

/** Executes named SparkEntry queries under the BENCH session config and
  * prints the FINAL adaptive plan (isFinalPlan=true — runtime join
  * swaps, AQEShuffleReads and reused exchanges included), which the
  * static [[PlanDump]] cannot show. Evidence tool for AQE-dependent
  * claims (e.g. whether `maxShuffledHashJoinLocalMapThreshold` flips a
  * join at sf0.1).
  *
  * Usage: runMain graft.FinalPlan <sfDir> <q1,q2,...> [outDir:suffix]
  * Env: SPARK_GRAFT_SHJ=off disables the bench's runtime SMJ→SHJ
  * conversion (default on, 64m — the bench value).
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q2_min_cost"))
    val outSpec = args.drop(2).headOption.filter(_.contains(":")).map { spec =>
      val i = spec.lastIndexOf(':')
      (spec.substring(0, i), "_" + spec.substring(i + 1))
    }
    val shj = if (sys.env.get("SPARK_GRAFT_SHJ").contains("off")) "0" else "64m"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-finalplan")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", shj)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.prep(spark)
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          val df = fn(spark, sfDir)
          // Execute THIS df's own QueryExecution (a count()/noop-write
          // replans the logical tree into a fresh QueryExecution whose
          // adaptive plan finalizes invisibly — observed r13: the dumped
          // plans still said isFinalPlan=false).
          val t0 = System.nanoTime()
          df.queryExecution.toRdd.count()
          val dt = (System.nanoTime() - t0) / 1e9
          val plan = df.queryExecution.executedPlan.toString.trim
          println(f"## $n (shj=$shj, noop ${dt}%.2f s)\n\n```\n$plan\n```\n")
          outSpec.foreach { case (dir, suffix) =>
            val p = java.nio.file.Paths.get(dir, s"$n$suffix.txt")
            java.nio.file.Files.createDirectories(p.getParent)
            java.nio.file.Files.write(p, plan.getBytes("UTF-8"))
          }
        case None => System.err.println(s"[finalplan] unknown query: $n")
      }
    }
    spark.stop()
  }
}
