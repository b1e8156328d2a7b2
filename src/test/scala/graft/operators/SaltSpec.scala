package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSum equals plain groupBy sum/count on a skewed key") {
    // one hot key (90% of rows) + a tail
    val rows = Seq.fill(900)(("hot", 1.0)) ++ (1 to 100).map(i => (s"k$i", i.toDouble))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = Salt.saltedSum(df, col("k"), col("v"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    val plain = df.groupBy("k").agg(sum("v"), count(lit(1)))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join on a skewed key") {
    val left = (Seq.fill(500)(("hot", 1)) ++ Seq(("a", 2), ("b", 3))).toDF("k", "lv")
      .repartition(8)
    val right = Seq(("hot", 10), ("a", 20), ("c", 30)).toDF("k", "rv")
    val salted = Salt.saltedJoin(left, right, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("rv").as("s"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val plain = left.join(right, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("rv").as("s"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(salted == plain)
  }
}
