package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomMightContain, CmsEstimate, CosineSimilarity}

/** Session extensions installing the engine's native functions — loaded by
  * name via `spark.sql.extensions` (see [[Session.local]]), the standard
  * plug-in point, so plain `spark.sql("graft_cosine(a, b)")` works in any
  * session configured with the library.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_cosine(arrayA, arrayB)")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        "graft_bloom_might_contain"),
      (children: Seq[Expression]) => BloomMightContain.fromChildren(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "graft_cms_estimate"),
      (children: Seq[Expression]) => CmsEstimate.fromChildren(children)))
  }
}
