package graft

import graft.operators.Curation

/** Each curation stage must drop exactly its targets: language gate,
  * length gate, near-dup canonical drop, decontamination — and the
  * survivors' accounting must be exact. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def en(base: String, extra: String): String =
    (1 to 30).map(i => s"$base$i").mkString(" ") + " the a of and " + extra

  test("curate drops non-en, short, non-canonical near-dup and contaminated docs") {
    val evalDoc = (1 to 20).map(i => s"eval$i").mkString(" ")
    val docs = Seq(
      (1L, "src_eval", evalDoc), // eval split: defines the held-out grams
      (20L, "src_a", "der die das und " + (1 to 30).map(i => s"wort$i").mkString(" ")), // de
      (21L, "src_a", "the a of and tiny"), // too short
      (22L, "src_a", en("x", "alpha beta gamma delta")), // canonical of the pair
      (23L, "src_a", en("x", "alpha beta gamma epsilon")), // near-dup of 22 -> dropped
      (24L, "src_b", en("y", "eval1 eval2 eval3 eval4")), // shares an eval 4-gram
      (25L, "src_b", en("z", "uniq1 uniq2 uniq3 uniq4"))) // kept
      .toDF("doc_id", "source", "text")
    val out = Curation.curate(docs, evalSplit = 10L)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set("src_a", "src_b"))
    assert(out("src_a")._1 == 1L, "only the canonical near-dup survives src_a")
    assert(out("src_b")._1 == 1L, "contaminated doc dropped from src_b")
    // token accounting is exact: doc 22 and 25 are the survivors
    assert(out("src_a")._2 == 38L && out("src_b")._2 == 38L)
  }

  test("LSH (default) and exact-pairs wirings produce identical curation output") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lsh = Curation.curate(docs).as[(String, Long, Long)].collect().toSet
    val exact = Curation.curate(docs, nearDupPairs = Curation.exactPairs)
      .as[(String, Long, Long)].collect().toSet
    assert(lsh == exact, "full-recall LSH must match the exact inverted-index path")
    assert(lsh.nonEmpty)
  }
}
