package graft.queries

import org.apache.spark.sql.SparkSession

/** Diagnostic main: times each materialized corpus artifact build
  * stage separately (the chain Bench reports in aggregate as `prep`).
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.queries.ArtifactProf
  */
object ArtifactProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-artifact-prof")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.prep(spark)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    t("scan_only")(graft.Tables.documents(spark, sfDir).count())
    t("shingle_raw")(Fingerprints.shingleIndexForProf(spark, sfDir).count())
    t("postings")(Fingerprints.postings(spark, sfDir).count())
    t("minhash_cands")(Fingerprints.candidatePairsForProf(spark, sfDir).count())
    t("confirmed_pairs")(Fingerprints.confirmedPairsForProf(spark, sfDir).count())
    spark.stop()
  }
}
