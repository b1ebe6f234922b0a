package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types._

/** Centered matrix-vector product kernel: y = W · (x − m), the
  * projection step of PCA/ZCA whitening (and any learned linear map
  * over an embedding column). One fused double-accumulated loop per
  * row — the composed `transform(sequence, i -> aggregate(zip_with`
  * form allocates a fresh lambda frame per OUTPUT element and stays
  * interpreted, the same per-row-allocation trap [[PqCosine]] was
  * built to avoid. `w` (array<array<float>>, rows of the matrix) and
  * `m` (array<float>) must be foldable — they are decoded once and
  * shipped as codegen reference objects, like every kernel here.
  *
  * The inner accumulation runs in double and rounds once to float per
  * output element; inputs shorter than a W row contribute their
  * prefix (whiten's caller guards dimensions loudly — see
  * [[graft.operators.Similarity.whiten]]'s require). */
case class MatVecCentered(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _),
          ArrayType(FloatType, _)) if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "mat_vec_centered expects (array<float>, foldable array<array<float>>, " +
          "foldable array<float>)")
    }

  @transient private lazy val mat: Array[Array[Float]] = decodeMat()
  @transient private lazy val mean: Array[Float] = decodeMean()

  private def decodeMat(): Array[Array[Float]] = {
    val arr = second.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getArray(i).toFloatArray())
  }

  private def decodeMean(): Array[Float] =
    third.eval().asInstanceOf[ArrayData].toFloatArray()

  /** Shared kernel (also called from generated code). */
  def project(v: Array[Float], w: Array[Array[Float]],
      m: Array[Float]): ArrayData = {
    val dIn = math.min(v.length, m.length)
    val c = new Array[Double](dIn)
    var j = 0
    while (j < dIn) { c(j) = v(j).toDouble - m(j); j += 1 }
    val out = new Array[Float](w.length)
    var i = 0
    while (i < w.length) {
      val row = w(i)
      val n = math.min(row.length, dIn)
      var s = 0.0
      var k = 0
      while (k < n) { s += row(k) * c(k); k += 1 }
      out(i) = s.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any, w: Any, m: Any): Any =
    project(v.asInstanceOf[ArrayData].toFloatArray(), mat, mean)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("graftWhitenMat", decodeMat(), "float[][]")
    val meanRef = ctx.addReferenceObj("graftWhitenMean", decodeMean(), "float[]")
    val selfRef = ctx.addReferenceObj("graftMatVec", this,
      classOf[MatVecCentered].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"${ev.value} = $selfRef.project($v.toFloatArray(), $matRef, $meanRef);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "mat_vec_centered"
}

object MatVecCentered {
  def matVecCentered(v: Column, w: Seq[Seq[Float]], m: Seq[Float]): Column = {
    import org.apache.spark.sql.functions.typedlit
    GraftColumnBridge.column(MatVecCentered(
      GraftColumnBridge.expression(v),
      GraftColumnBridge.expression(typedlit(w)),
      GraftColumnBridge.expression(typedlit(m))))
  }
}
