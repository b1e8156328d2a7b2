package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the hand-rolled complement to AQE's
  * runtime skew-join splitting, for when skew is KNOWN up front (a hot
  * user, a stop-shingle, a null-ish default key).
  *
  * At 100 TB a single hot key can put one reducer hours behind its
  * peers; salting fans that key's rows across `buckets` partitions at
  * the cost of a second (tiny, per-key) aggregation or a `buckets`-fold
  * replication of the other join side's hot rows.
  */
object Salt {

  /** Two-phase salted aggregation: groupBy (key, salt) partial, then
    * groupBy key final — correct for associative aggregates (sum, count,
    * min, max); the salt values themselves are nondeterministic but the
    * final per-key re-aggregation is salt-independent.
    */
  def saltedSum(df: DataFrame, key: Column, value: Column,
      buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    salted
      .groupBy(key.as("k"), col("__salt"))
      .agg(sum(value).as("s"), count(lit(1)).as("n"))
      .groupBy("k")
      .agg(sum("s").as("sum"), sum("n").as("count"))
  }

  /** Salted equi-join against a side with hot keys: replicate each right
    * row `buckets` times (one per salt), salt the skewed left side
    * randomly-but-deterministically, and join on (key, salt). Right side
    * must be the SMALL side (its size multiplies by `buckets`).
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      buckets: Int = 16): DataFrame = {
    val saltedLeft = skewed.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)).cast("int"))
    val replicatedRight = small
      .withColumn("__salt", explode(lit((0 until buckets).toArray)))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
