package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built Bloom filter — the
  * filter ships as ONE serialized binary literal, is decoded once per
  * task as a codegen reference object, and each row's probe is a
  * direct virtual call inside whole-stage codegen. This retires the
  * plain-scala-UDF closures that [[graft.operators.BloomPrune]] and
  * the n-gram decontamination path carried (the last per-row UDF
  * boundary on a gate path): a UDF forces every key through the
  * catalyst↔scala converter and fences the codegen stage, which is
  * exactly the per-row bill a scan-side prefilter exists to avoid.
  * Same position in the plan (behind the pushed-down column scan,
  * before every exchange), same sketch, same answers.
  *
  * Key types: long (`mightContainLong`) and string
  * (`mightContainString` on the decoded value — bit-identical to the
  * UDF form, which probed with the deserialized java String). A null
  * key yields null, which a Filter drops — the UDF forms' behavior.
  *
  * The serialized-bytes-child shape (rather than holding the filter
  * object) keeps the expression tree plan-serializable and the
  * decoded sketch shared per task via `addReferenceObj`, the
  * [[PqCosine]] codebook pattern.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | StringType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain expects (foldable binary serialized filter, " +
          "bigint or string key)")
    }

  @transient private lazy val filter: BloomFilter = decodeFilter()

  private def decodeFilter(): BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(bytes: Any, key: Any): Any =
    right.dataType match {
      case LongType => filter.mightContainLong(key.asInstanceOf[Long])
      case StringType =>
        filter.mightContainString(key.asInstanceOf[UTF8String].toString)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fRef = ctx.addReferenceObj("graftBloomFilter", decodeFilter(),
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, k) => right.dataType match {
      case LongType   => s"${ev.value} = $fRef.mightContainLong($k);"
      case StringType => s"${ev.value} = $fRef.mightContainString($k.toString());"
      case other => throw new IllegalStateException(
        s"unreachable past type check: $other")
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_might_contain"

  // plan display elides the serialized sketch: a literal filter is
  // megabytes of hex at real key counts, and printing it would bloat
  // every explain/UI string the expression appears in
  override def toString: String = {
    val l = left match {
      case Literal(b: Array[Byte], BinaryType) => s"<bloom:${b.length}B>"
      case other                               => other.toString
    }
    s"$prettyName($l, $right)"
  }
}

object BloomMightContain {
  /** `bloomMightContain(bf, $"key")` — the driver-built sketch ships
    * serialized as one literal (a few MB at 10^8 keys / 3% fpp) and
    * decodes once per task. */
  def bloomMightContain(filter: BloomFilter, key: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    GraftColumnBridge.column(BloomMightContain(
      Literal.create(bos.toByteArray, BinaryType),
      GraftColumnBridge.expression(key)))
  }
}
