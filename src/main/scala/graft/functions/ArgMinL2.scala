package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types._

/** Nearest-codeword kernel by SQUARED L2 distance: index (0-based) of
  * the codeword closest to the input vector, ties to the lowest index.
  * The Euclidean sibling of [[ArgMaxCosine]] — product-quantization
  * assignment minimizes reconstruction error, which is L2 on the raw
  * subvector, not angle (two subvectors at the same angle but
  * different magnitudes reconstruct very differently). `right` must be
  * a foldable array<array<float>> (the codebook), decoded once;
  * codewords are scored in one fused loop per row — the same
  * re-decode-per-call trap ArgMaxCosine exists to avoid.
  */
case class ArgMinL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "argmin_l2 expects (array<float>, foldable array<array<float>>)")
  }

  @transient private lazy val codebook: Array[Array[Float]] = decodeMatrix()

  private def decodeMatrix(): Array[Array[Float]] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getArray(i).toFloatArray())
  }

  /** Shared kernel (also called from generated code). */
  def bestIndex(v: Array[Float], words: Array[Array[Float]]): Int = {
    var best = -1; var bestD = Double.PositiveInfinity
    var c = 0
    while (c < words.length) {
      val w = words(c)
      val n = math.min(v.length, w.length)
      var d = 0.0
      var j = 0
      while (j < n) {
        val diff = v(j).toDouble - w(j)
        d += diff * diff; j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def nullSafeEval(v: Any, cs: Any): Any =
    bestIndex(v.asInstanceOf[ArrayData].toFloatArray(), codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("graftCodebook", decodeMatrix(), "float[][]")
    val selfRef = ctx.addReferenceObj("graftArgminL2", this, classOf[ArgMinL2].getName)
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $selfRef.bestIndex($v.toFloatArray(), $matRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "argmin_l2"
}

object ArgMinL2 {
  def argminL2(v: Column, codebook: Seq[Seq[Float]]): Column = {
    import org.apache.spark.sql.functions.typedlit
    GraftColumnBridge.column(ArgMinL2(
      GraftColumnBridge.expression(v),
      GraftColumnBridge.expression(typedlit(codebook))))
  }
}
