package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for sink-store compaction: on RANDOM
  * batch layouts (count, sizes, gaps from zero-row batches) with a
  * random watermark, (1) compaction is content-neutral and keeps
  * above-watermark partitions untouched, and (2) a crash at either
  * injectable phase boundary followed by recovery yields the same
  * content as never crashing — properties the example-based
  * CompactionSpec cannot sweep. */
object CompactionProps extends Properties("graft.compaction") {

  private lazy val spark: SparkSession = graft.core.GraftSession.configure(
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  private lazy val fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  // batch sizes, possibly zero (a zero-row batch writes NO partition
  // dir — watermark gaps must not confuse the fold)
  private val layoutGen: Gen[(List[Int], Int)] = for {
    nBatches <- Gen.chooseNum(1, 7)
    sizes <- Gen.listOfN(nBatches, Gen.chooseNum(0, 25))
    safeBelow <- Gen.chooseNum(0, nBatches + 1)
  } yield (sizes, safeBelow)

  private def mkStore(sizes: List[Int]): String = {
    val store = s"${Files.createTempDirectory("compact-prop")}/store"
    sizes.zipWithIndex.foreach { case (n, b) =>
      graft.streaming.EventStreams.idempotentParquetSink(store)(
        spark.range(b * 100, b * 100 + n)
          .select(col("id"), (col("id") % 7).as("v")), b.toLong)
    }
    store
  }

  private def contents(store: String): Seq[String] = {
    import spark.implicits._
    // a store of only zero-row batches has dirs but no data files —
    // unreadable IS empty (same convention as VecIngestSpec)
    if (!fs.exists(new Path(store))) Seq.empty
    else
      try spark.read.parquet(store).select("id", "v").as[(Long, Long)]
        .collect().sorted.map(_.toString).toSeq
      catch { case _: org.apache.spark.sql.AnalysisException => Seq.empty }
  }

  property("compact is content-neutral and never touches ids >= safeBelow") =
    forAll(layoutGen) { case (sizes, safeBelow) =>
      val store = mkStore(sizes)
      val before = contents(store)
      val tailDirs = fs.listStatus(new Path(store))
        .map(_.getPath.getName)
        .filter(n => n.startsWith("batch_id=") &&
          n.stripPrefix("batch_id=").toLong >= safeBelow).toSet
      graft.streaming.Compaction.compact(spark, store, safeBelow.toLong,
        targetFileBytes = 1L << 20)
      val tailAfter = fs.listStatus(new Path(store))
        .map(_.getPath.getName)
        .filter(n => n.startsWith("batch_id=") &&
          n.stripPrefix("batch_id=").toLong >= safeBelow).toSet
      contents(store) == before && tailAfter == tailDirs
    }

  property("tier: moved ∪ tail == original on random layouts; >= safeBelow untouched") =
    forAll(layoutGen) { case (sizes, safeBelow) =>
      val store = mkStore(sizes)
      val tierP = s"$store-tier"
      val before = contents(store)
      graft.streaming.Compaction.tierByKey(spark, store, tierP, safeBelow.toLong,
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("v"),
          org.apache.spark.sql.functions.lit(8)))
      import spark.implicits._
      val tiered = graft.streaming.Compaction.loadTier(spark, tierP)
        .map(_.select("id", "v").as[(Long, Long)].collect().toSeq)
        .getOrElse(Seq.empty)
      val tail = contents(store)
      val tailIds = fs.listStatus(new Path(store))
        .map(_.getPath.getName).filter(_.startsWith("batch_id="))
        .map(_.stripPrefix("batch_id=").toLong)
      (tiered.map(_.toString) ++ tail.map(_.toString)).sorted ==
        before.map(_.toString).sorted && tailIds.forall(_ >= safeBelow)
    }

  property("tier crash at a random phase + recover == never crashed") =
    forAll(layoutGen, Gen.oneOf("built", "swapping")) {
      case ((sizes, safeBelow), crashAt) =>
        val store = mkStore(sizes)
        val tierP = s"$store-tier"
        val before = contents(store)
        val crashed =
          try {
            graft.streaming.Compaction.tierByKey(spark, store, tierP,
              safeBelow.toLong,
              org.apache.spark.sql.functions.pmod(
                org.apache.spark.sql.functions.col("v"),
                org.apache.spark.sql.functions.lit(8)),
              onPhase = p => if (p == crashAt) throw new RuntimeException("die"))
            false
          } catch { case e: RuntimeException if e.getMessage == "die" => true }
        if (crashed) graft.streaming.Compaction.recoverTier(spark, store, tierP)
        graft.streaming.Compaction.tierByKey(spark, store, tierP, safeBelow.toLong,
          org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("v"),
            org.apache.spark.sql.functions.lit(8)))
        import spark.implicits._
        val tiered = graft.streaming.Compaction.loadTier(spark, tierP)
          .map(_.select("id", "v").as[(Long, Long)].collect().toSeq)
          .getOrElse(Seq.empty)
        (tiered.map(_.toString) ++ contents(store).map(_.toString)).sorted ==
          before.map(_.toString).sorted
    }

  property("crash at a random phase + recover == never crashed") =
    forAll(layoutGen, Gen.oneOf("built", "swapping")) {
      case ((sizes, safeBelow), crashAt) =>
        val store = mkStore(sizes)
        val before = contents(store)
        val crashed =
          try {
            graft.streaming.Compaction.compact(spark, store, safeBelow.toLong,
              targetFileBytes = 1L << 20,
              onPhase = p => if (p == crashAt) throw new RuntimeException("die"))
            false
          } catch { case e: RuntimeException if e.getMessage == "die" => true }
        if (crashed) graft.streaming.Compaction.recover(spark, store)
        // a second compact (same watermark) must also be clean
        graft.streaming.Compaction.compact(spark, store, safeBelow.toLong,
          targetFileBytes = 1L << 20)
        contents(store) == before
    }
}
