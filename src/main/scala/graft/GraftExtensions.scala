package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `spark.sql.extensions=graft.GraftExtensions` — injects every graft SQL
  * function at session build time, so pure-SQL deployments (thrift server,
  * spark-sql, notebooks with no Scala cell) get the surface without
  * calling [[graft.functions.registerAll]]. Same builders as the
  * session-level registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.sqlFunctions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}
