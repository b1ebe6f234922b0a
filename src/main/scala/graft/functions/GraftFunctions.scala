package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for graft's custom expressions, via the two
  * public routes:
  *
  *  - [[GraftExtensions]]: `SparkSessionExtensions` injector for new
  *    sessions —
  *    `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.functions.GraftExtensions`;
  *  - [[GraftFunctions.register]]: registration into an already-running
  *    session's function registry (same builders).
  *
  * After either, `SELECT cosine_similarity(a, b)` works from SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.definitions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    // fuse size(regexp_extract_all(s, p, 0)) -> regexp_count(s, p)
    ext.injectOptimizerRule(_ => FuseRegexpCount)
    // naive bounded-range join -> two-bucket equi-join (kills the
    // BroadcastNestedLoopJoin a pure-inequality condition forces)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}

object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  val definitions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity(a, b) takes two arguments")
        CosineSimilarity(args.head, args(1))
      }),
    (FunctionIdentifier("regexp_count"),
      new ExpressionInfo(classOf[RegexpCount].getName, "regexp_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "regexp_count(str, regexp) takes two arguments")
        RegexpCount(args.head, args(1))
      }),
    (FunctionIdentifier("argmax_cosine"),
      new ExpressionInfo(classOf[ArgMaxCosine].getName, "argmax_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "argmax_cosine(vec, centroid_matrix) takes two arguments")
        ArgMaxCosine(args.head, args(1))
      }),
    (FunctionIdentifier("sign_buckets"),
      new ExpressionInfo(classOf[SignBuckets].getName, "sign_buckets"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "sign_buckets(vec, plane_tensor) takes two arguments")
        SignBuckets(args.head, args(1))
      }),
    (FunctionIdentifier("argmin_l2"),
      new ExpressionInfo(classOf[ArgMinL2].getName, "argmin_l2"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "argmin_l2(vec, codebook) takes two arguments")
        ArgMinL2(args.head, args(1))
      }),
    (FunctionIdentifier("pq_cosine"),
      new ExpressionInfo(classOf[PqCosine].getName, "pq_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "pq_cosine(codes, query, codebooks) takes three arguments")
        PqCosine(args.head, args(1), args(2))
      }),
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        "bloom_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "bloom_might_contain(serialized_filter, key) takes two arguments")
        BloomMightContain(args.head, args(1))
      }))

  /** Register into a live session (uses the classic session's registry
    * through the sql-package bridge). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.classic.GraftColumnBridge
        .registerFunction(spark, ident, info, builder)
    }
}
