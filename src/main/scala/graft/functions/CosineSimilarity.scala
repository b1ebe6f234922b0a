package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two float-array
  * columns in a single fused loop, with whole-stage codegen
  * (`doGenCode`).
  *
  * Rationale (SURVEY §7.3 preference order): the composable form —
  * `aggregate(zip_with(a, b, _*_), 0d, _+_) / (norm(a) * norm(b))` —
  * allocates an intermediate array and interprets its lambda per
  * element; higher-order functions are not codegen'd. For an ANN scan
  * that evaluates |corpus| * |queries| pairs this is the hot path, so
  * a custom scalar Expression is warranted. Semantics are identical
  * (same left-to-right double accumulation), so the DuckDB oracle for
  * the composable version validates this one too.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Produces null from non-null inputs (length mismatch / zero norm),
  // so nullability cannot be derived from the children alone.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<float> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** Null (not a truncated score, not NaN) when the vectors disagree
    * on dimension or either norm is zero — matching the composable
    * zip_with/aggregate form, which nulls out on length mismatch
    * (zip_with pads with null) rather than silently scoring a prefix. */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toFloatArray()
    val ys = b.asInstanceOf[ArrayData].toFloatArray()
    if (xs.length != ys.length) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < xs.length) {
      val x = xs(i).toDouble; val y = ys(i).toDouble
      dot += x * y; nx += x * x; ny += y * y
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
         |float[] $xs = $a.toFloatArray();
         |float[] $ys = $b.toFloatArray();
         |if ($xs.length != $ys.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $xs.length; $i++) {
         |    double x = (double) $xs[$i]; double y = (double) $ys[$i];
         |    $dot += x * y; $nx += x * x; $ny += y * y;
         |  }
         |  if ($nx == 0.0 || $ny == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}

object CosineSimilarity {
  /** Column-API entry point: `cosineSim($"a", $"b")`. */
  def cosineSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
