package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * returns `array<struct<pos:int, hash:bigint>>` — the positions whose
  * k-gram polynomial hash is the minimum of the trailing window of w
  * gram hashes, exactly the local-minima rule of
  * [[graft.operators.TextAnalysis.winnowingComposable]].
  *
  * Why a custom Expression (SURVEY §7.3 preference order): the
  * composable form nests `aggregate(slice(...))` inside a
  * `transform(sequence(...))` — higher-order functions interpret
  * their lambdas per element AND the per-position slice allocates, so
  * the corpus scan pays ~150 us/doc. This one compiled JVM loop over
  * the codepoints does the same arithmetic in ~2 us/doc. Semantics
  * are bit-identical (same fold, same mod), so the DuckDB oracle for
  * the composable form validates this one too, and Round9Props holds
  * them identical on random corpora.
  *
  * The gram hash is the slice-fold h(p) = fold(acc*257 + cp mod 1e15)
  * — O(k) per position rather than a rolling O(1) update, because the
  * rolling subtraction needs (cp * 257^(k-1)) mod 1e15, a 71-bit
  * product that long arithmetic cannot hold; at k=8 the fold is ~8
  * multiply-adds per char and never leaves int64 (every intermediate
  * < 2.6e17).
  *
  * CodegenFallback is deliberate: the output is a per-row
  * array-of-structs built once per document, not an inner-loop scalar
  * — the expensive part (the char loop) is this compiled method
  * either way, and the composable form it replaces was already
  * interpreted. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, s"winnow_fingerprints: k and w must be >= 1 (got $k, $w)")

  private val Mod = 1000000000000000L

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("hash", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects a string input, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // codepoints, matching ascii() over split(text, "") for BMP text
    val cps = new Array[Long](s.codePointCount(0, s.length))
    var ci = 0; var si = 0
    while (si < s.length) {
      val cp = s.codePointAt(si)
      cps(ci) = cp.toLong; ci += 1; si += Character.charCount(cp)
    }
    val ng = cps.length - k + 1
    if (ng < w) return new GenericArrayData(Array.empty[Any])
    val gh = new Array[Long](ng)
    var p = 0
    while (p < ng) {
      var acc = 0L; var i = 0
      while (i < k) { acc = (acc * 257L + cps(p + i)) % Mod; i += 1 }
      gh(p) = acc; p += 1
    }
    val out = Vector.newBuilder[Any]
    p = w - 1
    while (p < ng) {
      var m = gh(p); var j = p - w + 1
      while (j < p) { if (gh(j) < m) m = gh(j); j += 1 }
      if (gh(p) == m) out += InternalRow(p, gh(p))
      p += 1
    }
    new GenericArrayData(out.result().toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

object WinnowFingerprints {
  /** Column-API entry point. */
  def winnowFp(text: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(WinnowFingerprints(
      GraftColumnBridge.expression(text), k, w))
}
