package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (SparkSessionExtensions): registers the native
  * expressions under SQL-callable names. Installed by
  * [[graft.Engine.session]] via `spark.sql.extensions`; after that
  * `SELECT graft_dot(a, b)` and `functions.call_function("graft_dot", …)`
  * resolve to [[DotProductExpr]].
  *
  * This is tier (c) of the custom-operator preference order (SURVEY.md §4.2):
  * only the scalar expression needed codegen; no custom LogicalPlan/
  * Strategy is required for the reference surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProductExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash64"),
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "graft_minhash64"),
      (children: Seq[Expression]) => MinHashSignatureExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash64"),
      (children: Seq[Expression]) => SimHashExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_vec_simhash"),
      new ExpressionInfo(classOf[VecSimHashExpr].getName, "graft_vec_simhash"),
      (children: Seq[Expression]) => VecSimHashExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_token_ngrams"),
      new ExpressionInfo(classOf[TokenNgramsExpr].getName, "graft_token_ngrams"),
      (children: Seq[Expression]) => TokenNgramsExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStatsExpr].getName, "graft_repetition_stats"),
      (children: Seq[Expression]) => RepetitionStatsExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowExpr].getName, "graft_winnow"),
      (children: Seq[Expression]) => WinnowExpr(children(0), children(1), children(2))))
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}
