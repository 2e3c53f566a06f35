package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd Bloom-filter membership probe:
  * `graft_bloom_might_contain(key BIGINT, filter BINARY-literal)`.
  *
  * The runtime-filter primitive for corpus-vs-set operations at 100 TB
  * (see `llm/Dedup.containmentBloom`): when the "set" side is too large
  * to broadcast as a join hash table (hundreds of millions of n-gram
  * keys), its Bloom filter still fits in a few hundred MB — ~1.2 bytes
  * per key at 1% fpp versus tens of bytes per entry in a broadcast hash
  * relation — so the big-side scan drops ~all non-members BEFORE any
  * shuffle, and a (now tiny) exact join downstream removes the false
  * positives. Same pattern as Spark's own `InjectRuntimeFilter`, exposed
  * as an explicit operator building block.
  *
  * The serialized filter rides as a NON-CHILD constructor argument, not
  * a `Literal` child: it still ships once in the task binary and
  * deserializes lazily per executor, but plan strings render only the
  * key expression — a multi-MB filter as a literal child would bloat
  * every explain/log/UI rendering of the plan. Generated code probes the
  * shared deserialized instance through `addReferenceObj` — one virtual
  * call inside whole-stage codegen, no UDF, no per-row work. Key hashing
  * must match the build side: `DataFrameStatFunctions.bloomFilter` over
  * an int64 column uses `putLong`, which `mightContainLong` mirrors —
  * callers feed `xxhash64` of the probed value on both sides.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(bloomBytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects a BIGINT key, got ${t.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  // the synthesized case-class equality compares Array[Byte] by
  // REFERENCE, so two semantically identical probes built from the same
  // filter bytes would never compare equal under canonicalization —
  // subexpression elimination and exchange reuse would silently miss
  // (conservative, but wasteful). Compare filter content instead.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
}

object BloomMightContain {
  /** Function-registry builder (`GraftExtensions`): the second argument
    * must be a foldable BINARY expression (e.g. `X'…'` in SQL text or a
    * `lit(bytes)` through `call_function`) — it is evaluated ONCE here,
    * at resolution, into the constructor argument.
    */
  def fromChildren(children: Seq[Expression]): BloomMightContain = {
    require(children.length == 2,
      "graft_bloom_might_contain(keyBigint, filterBinaryLiteral)")
    val f = children(1)
    require(f.resolved && f.foldable && f.dataType == BinaryType,
      "graft_bloom_might_contain filter argument must be a foldable BINARY " +
        "expression (the serialized filter is plan-constant)")
    val bytes = f.eval()
    require(bytes != null, "graft_bloom_might_contain filter must not be null")
    BloomMightContain(children.head, bytes.asInstanceOf[Array[Byte]])
  }
}
