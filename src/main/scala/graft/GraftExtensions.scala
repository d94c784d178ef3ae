package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-time session install of the engine's function library — the
  * Spark-idiomatic analog of the reference's `loadfn` runtime extension
  * loading (`/root/reference/core/env.c:262`):
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Every function is a plain Catalyst tree or a codegen `Expression` —
  * identical builders to `Graft.enableSql`, which remains for sessions
  * that already exist.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Graft.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.Graft", name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.NanosFilterInference)
  }
}
