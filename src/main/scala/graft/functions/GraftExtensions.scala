package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark extensions entry point: configure
  * `spark.sql.extensions=graft.functions.GraftExtensions` to get the graft
  * function family registered at session build time (the cluster-deploy
  * path; [[GraftFunctions.register]] is the equivalent imperative path for
  * sessions we don't build). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.VectorDotName),
      new ExpressionInfo(classOf[VectorDot].getName, GraftFunctions.VectorDotName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"${GraftFunctions.VectorDotName} takes 2 arguments, got ${exprs.length}")
        VectorDot(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.VectorMatMulName),
      new ExpressionInfo(classOf[VectorMatMul].getName, GraftFunctions.VectorMatMulName),
      GraftFunctions.matmulFromExprs(_)))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.SimHash64Name),
      new ExpressionInfo(classOf[SimHash64].getName, GraftFunctions.SimHash64Name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"${GraftFunctions.SimHash64Name} takes 1 argument, got ${exprs.length}")
        SimHash64(exprs.head)
      }))
  }
}
