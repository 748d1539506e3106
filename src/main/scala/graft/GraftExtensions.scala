package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-driven injection of the graft expression library — the
  * `SparkSessionExtensions` face of [[graft.functions.GraftFunctions]]:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * makes every `graft_*` SQL function available in EVERY session of the
  * application — including pure-SQL entry points (thriftserver, SQL
  * notebooks, `spark-sql`) where no driver code ever runs to call
  * `GraftFunctions.register(spark)`. Both faces build from the same
  * `GraftFunctions.all` list, so the two registration paths cannot
  * drift apart.
  *
  * Injection happens at session construction, before any query planning
  * — the functions land in the session's own registry, survive
  * `newSession()` isolation semantics the same way built-ins do, and
  * resolve inside views and cached plans. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
