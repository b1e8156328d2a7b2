package graft.extensions

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Cluster deployment hook: add
  * `--conf spark.sql.extensions=graft.extensions.GraftExtensions`
  * and every graft custom function is available to pure-SQL users on all
  * sessions, with no driver-side registration call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(builder.getClass.getCanonicalName, name),
        builder))
    }
  }
}
