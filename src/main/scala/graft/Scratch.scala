package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable

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
    val stages = mutable.ArrayBuffer.empty[(Int, String, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), dur,
          si.taskMetrics.executorRunTime, si.taskMetrics.jvmGCTime))
      }
    })
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("embed")(graft.queries.Similarity.queries("q_dedup_embed")(spark, dir).count())
    time("exact")(graft.queries.Dedup.queries("q_dedup_exact")(spark, dir).count())
    for (i <- 1 to 6) {
      stages.clear()
      time(s"jaccard #$i")(graft.queries.Fingerprints.queries("q_dedup_jaccard")(spark, dir).count())
      val slow = stages.sortBy(-_._3).take(5)
      slow.foreach { case (id, name, wall, run, gc) =>
        println(f"  stage $id%4d $name%-60s wall=${wall}ms run=${run}ms gc=${gc}ms")
      }
    }
    spark.stop()
  }
}
