package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types._

/** Fused RESIDUAL-PQ scorer: cosine(query, centroid + reconstruct(
  * codes)) in one loop — the IVFADC scoring kernel when codes encode
  * the residual `v - centroid(cell)` instead of the raw vector
  * (residuals concentrate around zero, so the same m x ksub code
  * budget quantizes markedly finer; the FAISS default for exactly
  * this reason). The per-row centroid arrives as a COLUMN (attached
  * by a broadcast join on the tiny cell table), the codebook as a
  * codegen reference object like [[PqCosine]]'s.
  *
  * Reconstruction element = float(centroid_i + codeword_i) — float
  * addition first, then double accumulation, matching the composable
  * `zip_with(cent, recon, (a, b) -> float(a + b))` + cosine form
  * bit-for-bit (Round13Spec pins it). Null on any shape mismatch or
  * zero norm, the [[CosineSimilarity]] conventions.
  */
case class PqCosineResidual(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(FloatType, _),
          ArrayType(FloatType, _),
          ArrayType(ArrayType(ArrayType(FloatType, _), _), _)) if fourth.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "pq_cosine_residual expects (array<int> codes, array<float> query, " +
          "array<float> centroid, foldable array<array<array<float>>> codebooks)")
    }

  @transient private lazy val books: Array[Array[Array[Float]]] = decodeBooks()

  private def decodeBooks(): Array[Array[Array[Float]]] = {
    val arr = fourth.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { j =>
      val bk = arr.getArray(j)
      Array.tabulate(bk.numElements())(c => bk.getArray(c).toFloatArray())
    }
  }

  /** Shared kernel (also called from generated code). */
  def score(codes: Array[Int], q: Array[Float], cent: Array[Float],
      bks: Array[Array[Array[Float]]]): java.lang.Double = {
    if (codes.length != bks.length || cent.length != q.length) return null
    var dot = 0.0; var nq = 0.0; var nr = 0.0
    var off = 0
    var j = 0
    while (j < bks.length) {
      val bk = bks(j)
      val c = codes(j)
      if (c < 0 || c >= bk.length) return null
      val w = bk(c)
      if (off + w.length > q.length) return null
      var i = 0
      while (i < w.length) {
        val x = q(off + i).toDouble
        val y = (cent(off + i) + w(i)).toDouble // float add, like zip_with
        dot += x * y; nq += x * x; nr += y * y
        i += 1
      }
      off += w.length
      j += 1
    }
    if (off != q.length || nq == 0.0 || nr == 0.0) null
    else dot / (math.sqrt(nq) * math.sqrt(nr))
  }

  override protected def nullSafeEval(c: Any, q: Any, cent: Any, b: Any): Any =
    score(c.asInstanceOf[ArrayData].toIntArray(),
      q.asInstanceOf[ArrayData].toFloatArray(),
      cent.asInstanceOf[ArrayData].toFloatArray(), books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("graftPqrBooks", decodeBooks(), "float[][][]")
    val selfRef = ctx.addReferenceObj("graftPqrCosine", this,
      classOf[PqCosineResidual].getName)
    nullSafeCodeGen(ctx, ev, (c, q, cent, _) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = $selfRef.score($c.toIntArray(), $q.toFloatArray(),
         |  $cent.toFloatArray(), $matRef);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)

  override def prettyName: String = "pq_cosine_residual"
}

object PqCosineResidual {
  def pqCosineResidual(codes: Column, q: Column, cent: Column,
      books: Seq[Seq[Seq[Float]]]): Column = {
    import org.apache.spark.sql.functions.typedlit
    GraftColumnBridge.column(PqCosineResidual(
      GraftColumnBridge.expression(codes),
      GraftColumnBridge.expression(q),
      GraftColumnBridge.expression(cent),
      GraftColumnBridge.expression(typedlit(books))))
  }
}
