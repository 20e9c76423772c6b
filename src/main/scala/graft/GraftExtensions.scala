package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ByteEntropy, ByteSum, DotProduct}

/** Session-extension entry point: the standard no-code-change deployment
  * path for the graft function library —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * registers the native expressions (`graft_dot`, `graft_bytesum`,
  * `graft_entropy`) into every session built from that config, so pure-SQL
  * users get them without calling `GraftSession.tune`. (`tune` remains the
  * programmatic route; both register the same expressions idempotently.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.FusePercentiles)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bytesum"),
      new ExpressionInfo(classOf[ByteSum].getName, "graft_bytesum"),
      (children: Seq[Expression]) => ByteSum(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_entropy"),
      new ExpressionInfo(classOf[ByteEntropy].getName, "graft_entropy"),
      (children: Seq[Expression]) => ByteEntropy(children.head)))
  }
}
