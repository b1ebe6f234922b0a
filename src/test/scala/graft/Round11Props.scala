package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the round-11 operators: the resumable
  * parquet-per-round connected-components loop must produce the SAME
  * cluster map as the in-memory checkpointed loop on random graphs —
  * the two implementations share the min-label math but differ in
  * convergence detection (stored chg column vs in-flight flag) and in
  * the shortcut (the resumable loop does plain propagation, the
  * in-memory one pointer-jumps), so agreement is a real invariant, not
  * a tautology.
  */
object Round11Props extends Properties("graft.round11") {

  private lazy val spark: SparkSession = graft.core.GraftSession.configure(
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  // random sparse graphs over <= 24 nodes, including self-contained
  // components, chains (worst case for plain propagation), and
  // multi-edge collisions (dedup'd by the loops' union)
  private val edgesGen: Gen[List[(Long, Long)]] = for {
    nNodes <- Gen.chooseNum(2, 24)
    nEdges <- Gen.chooseNum(1, 30)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.chooseNum(0, nNodes - 1)
      b <- Gen.chooseNum(0, nNodes - 1) if a != b
    } yield (math.min(a, b).toLong, math.max(a, b).toLong))
  } yield edges

  property("canonicalClustersResumable == canonicalClusters on random graphs") =
    forAll(edgesGen) { edges =>
      import spark.implicits._
      val pairs = edges.toDF("doc_a", "doc_b")
      val workDir = java.nio.file.Files
        .createTempDirectory("cc-prop").toFile.getAbsolutePath
      val resumable = Dedup.canonicalClustersResumable(pairs, workDir)
        .orderBy("doc_id").collect().toSeq
      val inMem = Dedup.canonicalClusters(pairs)
        .orderBy("doc_id").collect().toSeq
      resumable == inMem
    }

  // fast default profile (r22): full sweep depth via
  // -Dgraft.props.trials=full — see graft.TestProfile
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(TestProfile.trials(100, 20))
}
