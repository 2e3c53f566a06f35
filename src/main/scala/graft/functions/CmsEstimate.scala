package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Native codegen'd count-min-sketch frequency estimate:
  * `graft_cms_estimate(key BIGINT, sketch BINARY-literal) -> BIGINT`.
  *
  * The heavy-hitter prefilter primitive (see
  * `llm/TextAnalysis.heavyHitters`): a CMS never UNDER-estimates — every
  * counter a key hashes to is >= its true count, and the estimate is
  * their min — so `estimate >= threshold` admits a guaranteed SUPERSET
  * of the true above-threshold keys, which an exact count downstream
  * then confirms. At 100 TB the point is cardinality control: the
  * long-tail keys (billions of rare n-grams) are dropped BEFORE the
  * exact aggregation, so its hash map holds candidate keys only instead
  * of spilling under the full distinct-key load.
  *
  * Same carrier design as [[BloomMightContain]]: the serialized sketch
  * is a non-child constructor argument (plan strings stay readable),
  * deserialized lazily once per executor, probed from generated code via
  * `addReferenceObj`. Keys are int64 (callers feed `xxhash64`; a hash
  * collision only merges two keys' counts — MORE over-estimation, which
  * the exact confirm absorbs).
  */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(sketchBytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_estimate expects a BIGINT key, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)

  // content equality over the sketch bytes, for the same reason as
  // [[BloomMightContain]]: reference equality on Array[Byte] would make
  // semanticEquals miss identical probes and forgo subexpression
  // elimination / exchange reuse
  override def equals(other: Any): Boolean = other match {
    case c: CmsEstimate =>
      child == c.child && java.util.Arrays.equals(sketchBytes, c.sketchBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(sketchBytes)

  override def nullSafeEval(v: Any): Any =
    cms.estimateCount(v.asInstanceOf[java.lang.Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCms", cms,
      classOf[CountMinSketch].getName)
    // estimateCount takes Object; valueOf boxes the key (same per-row
    // cost Spark's own CountMinSketchAgg consumers pay)
    defineCodeGen(ctx, ev,
      c => s"$ref.estimateCount(java.lang.Long.valueOf($c))")
  }
}

object CmsEstimate {
  /** Function-registry builder (`GraftExtensions`): the second argument
    * must be a foldable BINARY expression, evaluated once at resolution.
    */
  def fromChildren(children: Seq[Expression]): CmsEstimate = {
    require(children.length == 2,
      "graft_cms_estimate(keyBigint, sketchBinaryLiteral)")
    val s = children(1)
    require(s.resolved && s.foldable && s.dataType == BinaryType,
      "graft_cms_estimate sketch argument must be a foldable BINARY " +
        "expression (the serialized sketch is plan-constant)")
    val bytes = s.eval()
    require(bytes != null, "graft_cms_estimate sketch must not be null")
    CmsEstimate(children.head, bytes.asInstanceOf[Array[Byte]])
  }
}
