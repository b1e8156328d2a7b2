package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Global row ordinals under a total order — the foundation for every
  * positional operation the reference exposes (`iloc`, `df[a:b]` slices,
  * `tail`, stable `RangeIndex`; SURVEY.md §2.2, reference kernels
  * `/root/reference/baloo/weld/weld_ops.py:136-228,307-414`).
  *
  * Spark has no row identity, and the obvious
  * `row_number().over(Window.orderBy(...))` collapses the whole dataset
  * into ONE partition — a non-starter at 100 TB. Instead:
  *
  *   1. `repartitionByRange(order)` + `sortWithinPartitions(order)` gives
  *      a globally sorted layout (partition i precedes partition i+1);
  *   2. `zipWithIndex` assigns contiguous ids with one lightweight
  *      count-per-partition job and a per-partition offset — no data
  *      movement beyond the range shuffle.
  *
  * Cost: one range-exchange + one extra count stage; the RDD hop drops
  * out of whole-stage codegen for the id-attach step only. That is the
  * honest price of positional semantics on a distributed engine; callers
  * that only need head-k use `orderBy().limit(k)` (planned as
  * TakeOrderedAndProject) instead.
  */
object Ordinal {

  /** Append a 0-based global ordinal column named `name`, ordered by
    * `order` (must be a total order for deterministic results).
    */
  def withOrdinal(df: DataFrame, order: Seq[Column], name: String = "ord"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(name, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(rdd, schema)
  }

  /** Positional slice `df[start:stop)` under `order` — reference
    * `weld_slice` (`weld_ops.py:136-187`).
    */
  def slice(df: DataFrame, order: Seq[Column], start: Long, stop: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    withOrdinal(df, order).filter(col("ord") >= start && col("ord") < stop)
  }

  /** Scalar row lookup at position `i` — reference `iloc[int]`
    * (`weld_ops.py:307-330`).
    */
  def iloc(df: DataFrame, order: Seq[Column], i: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    withOrdinal(df, order).filter(col("ord") === i)
  }

  /** Gather rows by an arbitrary position array — reference
    * `iloc[indices]` (`weld_iloc_indices`, `weld_ops.py:333-367`):
    * broadcast-join the (small) index list against the ordinal column;
    * positions ≥ length simply match nothing (the reference emits a
    * missing sentinel there — `weld_ops.py:370-414` — which callers get
    * by left-joining from their indices instead).
    */
  def gather(df: DataFrame, order: Seq[Column], positions: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val spark = df.sparkSession
    import spark.implicits._
    val idx = positions.toDF("ord")
    withOrdinal(df, order).join(broadcast(idx), "ord")
  }
}
