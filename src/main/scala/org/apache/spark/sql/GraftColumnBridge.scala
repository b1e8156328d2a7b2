package org.apache.spark.sql

import org.apache.spark.sql.internal.{SortOrder => SortOrderNode}

/** Minimal bridge into Spark's `private[sql]` Column internals, used by
  * graft's scan machinery: a `Column` produced by `col(x).desc` wraps a
  * SortOrder node, which projection/grouping APIs reject — callers that
  * accept ordering columns (FrozenLayout / Scan) need the bare key
  * expression to run key-uniqueness checks. No other internals leak
  * through this object.
  */
object GraftColumnBridge {

  /** `col(x).desc`/`.asc_nulls_last` → `col(x)`; plain columns pass
    * through unchanged. Direction is irrelevant to the callers' use
    * (grouping on the key).
    */
  def stripSortOrder(c: Column): Column = c.node match {
    case so: SortOrderNode => Column(so.child)
    case _ => c
  }
}
