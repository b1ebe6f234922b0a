package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket kernel: for a foldable plane tensor
  * [table][plane][dim], returns one int bucket per table — bit i of
  * table t's bucket is the sign of (v · planes[t][i]). The sign of the
  * dot product equals the sign of the cosine (norms are positive), so
  * no norms or sqrts are computed at all.
  *
  * This exists for the same reason as [[ArgMaxCosine]]: composing
  * NumTables x PlanesPerTable scalar cosine calls re-decodes the row's
  * ArrayData once per call (64 times for 8x8) and re-computes the
  * vector norm every time. The kernel decodes the vector ONCE per row,
  * caches the plane tensor as a codegen reference object, and emits
  * all buckets in a single fused loop.
  */
case class SignBuckets(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(ArrayType(ArrayType(FloatType, _), _), _))
        if right.foldable => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "sign_buckets expects (array<float>, foldable array<array<array<float>>>)")
  }

  @transient private lazy val planeTensor: Array[Array[Array[Float]]] = decodeTensor()

  private def decodeTensor(): Array[Array[Array[Float]]] = {
    val tables = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(tables.numElements()) { t =>
      val planes = tables.getArray(t)
      Array.tabulate(planes.numElements())(p => planes.getArray(p).toFloatArray())
    }
  }

  /** Shared kernel (also called from generated code). */
  def buckets(v: Array[Float], tensor: Array[Array[Array[Float]]]): ArrayData = {
    val out = new Array[Int](tensor.length)
    var t = 0
    while (t < tensor.length) {
      val planes = tensor(t)
      var bucket = 0
      var p = 0
      while (p < planes.length) {
        val plane = planes(p)
        val n = math.min(v.length, plane.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += v(i).toDouble * plane(i); i += 1 }
        if (dot > 0) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any, ps: Any): Any =
    buckets(v.asInstanceOf[ArrayData].toFloatArray(), planeTensor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tensorRef = ctx.addReferenceObj("graftPlanes", decodeTensor(), "float[][][]")
    val selfRef = ctx.addReferenceObj("graftSignBuckets", this, classOf[SignBuckets].getName)
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $selfRef.buckets($v.toFloatArray(), $tensorRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sign_buckets"
}

object SignBuckets {
  def signBuckets(v: Column, tensor: Seq[Seq[Seq[Float]]]): Column = {
    import org.apache.spark.sql.functions.typedlit
    GraftColumnBridge.column(SignBuckets(
      GraftColumnBridge.expression(v),
      GraftColumnBridge.expression(typedlit(tensor))))
  }
}
