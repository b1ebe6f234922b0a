package graft.functions

import java.util.regex.{Matcher, Pattern}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of regexp matches in a string — the fused form of
  * `size(regexp_extract_all(s, p, 0))` without materializing the match
  * array. Token counting over a 100 TB text corpus allocates one
  * array per document in the composable form; this expression walks
  * the matcher and increments a counter.
  *
  * The pattern is compiled once per operator instance (the regexp is
  * foldable in every realistic call) both interpreted and in codegen
  * (mutable state, compiled at first use).
  */
case class RegexpCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"regexp_count expects (string, string), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  @transient private var lastRegex: UTF8String = _
  @transient private var pattern: Pattern = _

  override protected def nullSafeEval(s: Any, p: Any): Any = {
    val regex = p.asInstanceOf[UTF8String]
    if (pattern == null || !regex.equals(lastRegex)) {
      lastRegex = regex.clone()
      pattern = Pattern.compile(regex.toString)
    }
    val m = pattern.matcher(s.asInstanceOf[UTF8String].toString)
    var n = 0
    while (m.find()) n += 1
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternCls = classOf[Pattern].getName
    val patternRef = ctx.addMutableState(patternCls, "graftRcPattern")
    val lastRegexRef = ctx.addMutableState("UTF8String", "graftRcLastRegex")
    nullSafeCodeGen(ctx, ev, (s, p) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      s"""
         |if ($patternRef == null || !$p.equals($lastRegexRef)) {
         |  $lastRegexRef = $p.clone();
         |  $patternRef = $patternCls.compile($p.toString());
         |}
         |java.util.regex.Matcher $m = $patternRef.matcher($s.toString());
         |int $n = 0;
         |while ($m.find()) $n++;
         |${ev.value} = $n;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "regexp_count"
}

/** Optimizer rule: rewrite `size(regexp_extract_all(s, p, 0))` to
  * [[RegexpCount]]. Sound: both count all matches of the full pattern,
  * with identical null behavior (both null-intolerant). Injected via
  * [[GraftExtensions]] (`injectOptimizerRule`), so user queries written
  * in the composable form get the fused plan automatically.
  */
object FuseRegexpCount extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpExtractAll, Size}

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(RegExpExtractAll(s, p, Literal(0, IntegerType)), _) =>
        RegexpCount(s, p)
    }
}
