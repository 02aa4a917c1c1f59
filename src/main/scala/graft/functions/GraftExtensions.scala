package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: installs the engine's native
  * vector expressions into every session built with
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)`) — the canonical
  * cluster-wide integration route: users get `vector_cosine` & friends
  * in plain SQL on any session, including ones the engine never touches
  * programmatically (JDBC gateways, notebooks). `VectorFunctions
  * .ensureRegistered` remains the per-session programmatic fallback. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    VectorFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[VectorBinaryExpression].getName, name),
        builder))
    }
    // range-predicate joins rewritten to the bucketed equi-join plan
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // registered-view aggregates redirected to staged rollups; must run
    // at ANALYSIS time (post-hoc resolution) — by optimizer time column
    // pruning has fused the view's projections beyond canonical-plan
    // recognition
    ext.injectPostHocResolutionRule(_ => graft.plans.SummaryRewrite)
  }
}
