package graft

import org.apache.spark.sql.SparkSession

/** Targeted re-run of the ScaleStress scale100 cost legs for named
  * queries — the iteration tool for the 100× cost-ratio work (the full
  * gate is ~35 min; this reuses its generated fixtures and replicates
  * `timedLeg`'s protocol exactly: fresh caches, MIN of two runs,
  * shuffle partitions 32 at 10× / 128 at 100×).
  *
  * Usage: runMain graft.LegProf q_a,q_b  (fixtures must already exist
  * under target/scale10 and target/scale100 — run ScaleStress first).
  */
object LegProf {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q_dedup_substring", "q_dedup_substring_append"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timedLeg(d: String, q: String, parts: Int): Double = {
      def once(): Double = {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        Caches.clear(spark)
        spark.sparkContext.setJobDescription(s"$q@$d")
        // t0 BEFORE construction — ScaleStress.timedLeg times
        // construction+count, so driver-side construction work (e.g.
        // memo actions on cold caches) must land inside the window here
        // too or the ratios can disagree with the gate (ADVICE r13).
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, d)
        df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        // final adaptive plan: count() REPLANS into a fresh
        // QueryExecution (r13's noop-write spelling did too — its dumps
        // still printed isFinalPlan=false), so execute THIS df's own
        // QueryExecution to finalize the plan it prints.
        if (sys.env.get("SPARK_GRAFT_LEGPLAN").contains("1")) {
          df.queryExecution.toRdd.count()
          println(s"### $q@$d final plan\n" +
            df.queryExecution.executedPlan.toString.take(12000))
        }
        dt
      }
      try math.min(once(), once())
      finally spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    names.foreach { q =>
      val t10 = timedLeg("target/scale10", q, 32)
      val t100 = timedLeg("target/scale100", q, 128)
      println(f"LEGPROF $q t10=$t10%.1f s t100=$t100%.1f s ratio=${t100 / t10}%.1f")
    }
    spark.stop()
  }
}
