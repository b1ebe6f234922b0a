package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types._

/** Nearest-centroid kernel: index (0-based) of the centroid with the
  * highest cosine similarity to the input vector, ties to the lowest
  * index. `right` must be a foldable array<array<float>> (the centroid
  * matrix) — it is decoded ONCE (interpreted: lazy cache; codegen:
  * reference object), and the input vector is decoded once per row,
  * then all centroids are scored in a single fused loop.
  *
  * This exists because composing N scalar cosine calls re-decodes the
  * row vector N times and the constant matrix N times per row — at
  * 100k vectors x 64 centroids that was ~20x slower than this kernel.
  */
case class ArgMaxCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "argmax_cosine expects (array<float>, foldable array<array<float>>)")
  }

  @transient private lazy val centroidMatrix: Array[Array[Float]] = decodeMatrix()

  private def decodeMatrix(): Array[Array[Float]] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i =>
      arr.getArray(i).toFloatArray())
  }

  /** Shared kernel (also called from generated code). */
  def bestIndex(v: Array[Float], cents: Array[Array[Float]]): Int = {
    var nx = 0.0
    var i = 0
    while (i < v.length) { nx += v(i).toDouble * v(i); i += 1 }
    val nv = math.sqrt(nx)
    var best = -1; var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = math.min(v.length, cv.length)
      var dot = 0.0; var nc = 0.0
      var j = 0
      while (j < n) {
        val x = cv(j).toDouble
        dot += v(j).toDouble * x; nc += x * x; j += 1
      }
      val sim = dot / (nv * math.sqrt(nc))
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  override protected def nullSafeEval(v: Any, cs: Any): Any =
    bestIndex(v.asInstanceOf[ArrayData].toFloatArray(), centroidMatrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("graftCentroids", decodeMatrix(), "float[][]")
    val selfRef = ctx.addReferenceObj("graftArgmax", this, classOf[ArgMaxCosine].getName)
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $selfRef.bestIndex($v.toFloatArray(), $matRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "argmax_cosine"
}

object ArgMaxCosine {
  def argmaxCosine(v: Column, centroids: Seq[Seq[Float]]): Column = {
    import org.apache.spark.sql.functions.typedlit
    GraftColumnBridge.column(ArgMaxCosine(
      GraftColumnBridge.expression(v),
      GraftColumnBridge.expression(typedlit(centroids))))
  }
}
