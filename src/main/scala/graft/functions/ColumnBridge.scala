package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's package-private Column<->Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), needed to expose
  * custom Catalyst expressions (e.g. graft.functions.CosineSimilarity)
  * through the public Column API. This is the standard extension-point
  * gap in Spark 4's Column/ColumnNode split; no Spark internals are
  * modified.
  *
  * Version gating: everything here leans on `private[sql]` surface
  * that Spark may move between minor versions. When the compiled
  * bridge meets a Spark where an internal moved (LinkageError at call
  * time), the OPTIONAL path — [[unpersistCheckpoint]], a memory
  * optimization — degrades to a logged no-op instead of taking the
  * query down; the REQUIRED paths (column/expression/registerFunction,
  * without which custom expressions cannot exist at all) rethrow with
  * a message naming the moved internal. `forceDegraded` lets the spec
  * exercise the fallback without an incompatible Spark on the
  * classpath.
  */
object GraftColumnBridge {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The Spark versions this bridge's `private[sql]` reach-through
    * (ExpressionUtils.column/expression, the LogicalRDD constructor
    * shape, functionRegistry.registerFunction) has been verified
    * against. A Spark minor bump can MOVE these internals without a
    * LinkageError — a silent behavior change the catch-based guards
    * below cannot see — so the required paths refuse unverified
    * versions loudly instead. After verifying on a new Spark, add it
    * here; to run unverified anyway (at your own risk), set
    * `-Dgraft.bridge.allowUnverifiedSpark=true`, which downgrades the
    * refusal to a once-per-JVM warning. */
  val VerifiedSparkVersions: Set[String] = Set("4.1.2")

  /** Test hook: pretend the runtime Spark is this version. */
  @volatile var versionOverrideForTest: Option[String] = None

  @volatile private var versionWarned: Boolean = false

  private def requireVerifiedSpark(): Unit = {
    val v = versionOverrideForTest.getOrElse(org.apache.spark.SPARK_VERSION)
    if (!VerifiedSparkVersions.contains(v)) {
      val msg = s"GraftColumnBridge: Spark $v has not been verified " +
        s"against this bridge (verified: ${VerifiedSparkVersions.toSeq.sorted.mkString(", ")}). " +
        "The bridge reaches through private[sql] internals that a Spark " +
        "minor can move without a LinkageError — re-verify " +
        "ExpressionUtils.column/expression, the LogicalRDD constructor, " +
        "and functionRegistry.registerFunction on this version, then add " +
        "it to VerifiedSparkVersions; or set " +
        "-Dgraft.bridge.allowUnverifiedSpark=true to proceed unverified"
      if (sys.props.get("graft.bridge.allowUnverifiedSpark").contains("true")) {
        if (!versionWarned) { versionWarned = true; log.warn(msg) }
      } else throw new IllegalStateException(msg)
    }
  }

  /** Test hook: simulates the internal surface having moved.
    *
    * The hooks below are GLOBAL mutable state on a shared object and
    * are meant for single-threaded spec use only: a spec that sets
    * `forceDegraded` must clear BOTH flags in its `finally` block,
    * since any suite exercising checkpoint loops concurrently would
    * otherwise see its unpersists silently no-op (benign — blocks are
    * then merely held until GC) and a later probe of
    * `degradedObserved` could not tell which call degraded. */
  @volatile var forceDegraded: Boolean = false

  @volatile private var warned: Boolean = false

  /** True when the fallback path was taken at least once (spec probe;
    * never reset by production code — specs reset it themselves). */
  @volatile var degradedObserved: Boolean = false

  private def warnOnce(what: String, e: Throwable): Unit = {
    degradedObserved = true
    if (!warned) {
      warned = true
      log.warn(s"GraftColumnBridge: $what unavailable on this Spark build " +
        s"(${if (e == null) "forced by test hook" else e.toString}); " +
        "degrading to no-op — local checkpoints will be released by GC only")
    }
  }

  def column(e: Expression): Column = {
    requireVerifiedSpark()
    try ExpressionUtils.column(e)
    catch { case le: LinkageError =>
      throw new IllegalStateException(
        "GraftColumnBridge: ExpressionUtils.column moved in this Spark build; " +
          "custom graft expressions cannot be exposed as Columns", le)
    }
  }

  def expression(c: Column): Expression = {
    requireVerifiedSpark()
    try ExpressionUtils.expression(c)
    catch { case le: LinkageError =>
      throw new IllegalStateException(
        "GraftColumnBridge: ExpressionUtils.expression moved in this Spark build", le)
    }
  }

  /** Release the cached blocks behind a `localCheckpoint()`ed Dataset.
    * Spark exposes no public API to free a local checkpoint (blocks
    * otherwise live until the RDD is GC'd and the ContextCleaner runs),
    * which leaks executor memory in iterative loops that checkpoint per
    * round (e.g. connected-components label propagation). The
    * checkpointed plan is a `LogicalRDD` wrapping the cached RDD —
    * unpersist that RDD directly. No-op for non-checkpointed plans, and
    * a logged no-op when the internal plan class moved: the loop then
    * merely holds blocks until GC, it does not fail. */
  def unpersistCheckpoint(ds: org.apache.spark.sql.Dataset[_]): Unit =
    if (forceDegraded) warnOnce("unpersistCheckpoint", null)
    else
      try
        ds.asInstanceOf[Dataset[_]].queryExecution.analyzed.foreach {
          case l: org.apache.spark.sql.execution.LogicalRDD =>
            l.rdd.unpersist(blocking = false)
          case _ => ()
        }
      catch { case le: LinkageError => warnOnce("unpersistCheckpoint", le) }

  /** Bound the statistics a checkpoint carried into its `LogicalRDD`.
    *
    * `Dataset.{localCheckpoint,checkpoint}` preserves the ORIGINAL
    * plan's estimated stats on the resulting `LogicalRDD`
    * (`rewriteStatsAndConstraints`). Size estimation multiplies child
    * sizes at every join, so in an ITERATIVE loop (connected
    * components: each round self-joins frames pinned the previous
    * round) the carried `sizeInBytes` BigInt roughly DOUBLES ITS BIT
    * LENGTH per round — after ~10 rounds the driver spends its time
    * in BigInteger.multiply inside stats estimation, not in Spark
    * jobs (observed: the 100k-doc ring-topology curation soak pinned
    * the driver for >10 min at round ~12 while every executor sat
    * idle). Capping the stored estimate at Long.MaxValue breaks the
    * compounding: every downstream decision (notably
    * autoBroadcastJoinThreshold) compares against thresholds far
    * below the cap, so a capped huge value behaves identically to the
    * uncapped one, while the per-round stats computation stays O(64
    * bits). Small (broadcastable) estimates pass through untouched.
    *
    * Returns the dataset unchanged when the root is not a
    * `LogicalRDD` or the estimate is already bounded. */
  def capCheckpointStats(ds: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): org.apache.spark.sql.DataFrame = {
    val maxSize = BigInt(Long.MaxValue)
    try ds.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD
          if l.computeStats().sizeInBytes > maxSize =>
        val s = l.computeStats()
        val capped = new org.apache.spark.sql.catalyst.plans.logical.Statistics(
          maxSize, s.rowCount.map(_.min(maxSize)), s.attributeStats, s.isRuntime)
        val plan = new org.apache.spark.sql.execution.LogicalRDD(
          l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
          l.isStreaming, l.stream)(
          ds.sparkSession.asInstanceOf[SparkSession], Some(capped),
          Some(l.constraints))
        Dataset.ofRows(ds.sparkSession.asInstanceOf[SparkSession], plan)
      case _ => ds.toDF()
    } catch {
      case le: LinkageError => warnOnce("capCheckpointStats", le); ds.toDF()
    }
  }

  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit = {
    requireVerifiedSpark()
    try
      spark.asInstanceOf[SparkSession].sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    catch { case le: LinkageError =>
      throw new IllegalStateException(
        "GraftColumnBridge: functionRegistry surface moved in this Spark build", le)
    }
  }
}
