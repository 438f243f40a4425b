package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter membership probe as a native expression — the static
  * twin of Spark's AQE-injected runtime bloom join filter, for
  * operators that OWN the build side (d12's benchmark shingle set):
  * the serialized filter rides the plan as a reference object, each
  * task deserializes it once (transient lazy), and the per-row probe
  * is two hashes + bit tests — no UDF boxing, stays inside the
  * surrounding codegen stage.
  *
  * The filter must have been built over the SAME byte view of the
  * values it is probed with: `DataFrameStatFunctions.bloomFilter` on a
  * string column puts UTF-8 bytes via putString, and this probe calls
  * mightContainBinary on the column's UTF8String bytes — putString and
  * the byte probe hash the identical UTF-8 input, minus a per-row
  * UTF-16 decode + re-encode in the hot loop.
  *
  * False positives are the CONTRACT (rate set at build time): callers
  * use the probe strictly as a prefilter ahead of an exact confirm
  * join, so results stay exact while the shuffle downstream carries
  * only probe-passing rows.
  */
case class BloomMightContain(child: Expression, bits: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bf =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bits))

  override def nullSafeEval(input: Any): Any =
    // probe the UTF-8 bytes directly: mightContainString hashes
    // getBytes(UTF_8) of its argument, so this is the identical hash
    // path minus a per-row UTF-16 decode + re-encode in the hot loop
    bf.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (java.lang.Boolean) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}
