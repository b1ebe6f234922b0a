package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Planted-data checks for the corpus-statistics / batch-assembly
  * operators; the sf-corpus legs are hash-checked by the DuckDB gate.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("vocabTopK: ordered by occurrence desc then token, df <= occurrences") {
    val rows = Corpus.vocabTopK(spark, dir)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val keys = rows.map(r => (-r._2, r._1)).toSeq
    assert(keys == keys.sorted, "sorted by n_occ desc, tok asc")
    assert(rows.forall(r => r._3 <= r._2 && r._3 >= 1),
      "doc frequency bounded by occurrence count")
  }

  test("tfIdf: planted corpus gets exact tf/df and the portable score") {
    val d = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "apple cherry cherry date")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val out = withTempParquetDir(d) { tmp =>
      Corpus.tfIdf(spark, tmp)
        .select("doc_id", "tok", "tf", "df", "tf_idf")
        .as[(Long, String, Long, Long, Double)].collect()
    }
    val byKey = out.map(r => (r._1, r._2) -> r).toMap
    assert(byKey((1L, "apple"))._3 == 2 && byKey((1L, "apple"))._4 == 2)
    assert(byKey((3L, "cherry"))._3 == 2 && byKey((3L, "cherry"))._4 == 2)
    // tf_idf = (tf/n_tokens) * (N/df): doc1 apple = (2/3)*(3/2) = 1.0
    assert(byKey((1L, "apple"))._5 == (2.0 / 3.0) * (3.0 / 2.0))
    assert(byKey((2L, "banana"))._5 == (1.0 / 2.0) * (3.0 / 2.0))
  }

  test("packSequences: chunks respect the running token budget") {
    val out = Corpus.packSequences(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // per source: chunk ids contiguous from 0, totals add up to the corpus
    out.groupBy(_._1).foreach { case (_, chunks) =>
      val ids = chunks.map(_._2).sorted.toSeq
      assert(ids.head == 0 && ids == (0L until ids.length).toSeq,
        "contiguous chunk ids per source")
    }
    val totalDocs = out.map(_._3).sum
    val corpus = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(totalDocs == corpus, "every document lands in exactly one chunk")
    // a chunk only starts when the previous ones consumed its floor:
    // cum-before-doc < (chunk_id+1)*budget for the chunk's first doc,
    // so chunk_tokens for all but the last chunk must reach the budget
    // boundary: sum of earlier chunks >= chunk_id * budget.
    out.groupBy(_._1).foreach { case (_, chunks) =>
      val sorted = chunks.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, cid, _, _), i) =>
        val before = sorted.take(i).map(_._4).sum
        assert(before >= cid * Corpus.PackBudget - Corpus.PackBudget,
          "chunk boundary follows the cumulative budget")
      }
    }
  }

  test("qualityGate: keeps exactly the docs at/above the exact p20 of token count") {
    val out = Corpus.qualityGate(spark, dir)
      .as[(Long, String, Int, Double)].collect()
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n"))
      .as[(Long, Int)].collect()
    val sorted = all.map(_._2).sorted
    val thr = sorted(math.ceil(0.2 * sorted.length).toInt - 1) // p20 element
    assert(out.forall(_._4 == thr.toDouble))
    assert(out.map(_._1).toSet == all.filter(_._2 >= thr).map(_._1).toSet)
  }

  test("groupTopK: 3 longest docs per source, rank-ordered") {
    val out = Corpus.groupTopK(spark, dir)
      .as[(String, Long, Int, Int)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length).toSeq)
      assert(rows.length <= 3)
      val byRank = rows.sortBy(_._4).map(_._3).toSeq
      assert(byRank == byRank.sorted.reverse, "token counts descend with rank")
    }
  }

  test("plan shapes: top-k avoids full sort, tf-idf joins broadcast, no shuffle join anywhere") {
    val vocabPlan = Corpus.vocabTopK(spark, dir).queryExecution.executedPlan.toString
    assert(vocabPlan.contains("TakeOrderedAndProject"),
      "top-k must plan per-partition heaps, not a global sort")
    val tfidfPlan = Corpus.tfIdf(spark, dir).queryExecution.executedPlan.toString
    assert(tfidfPlan.contains("BroadcastHashJoin"), "df vocabulary side must broadcast")
    assert(!tfidfPlan.contains("SortMergeJoin"), "no shuffle join in tf-idf")
    val gatePlan = Corpus.qualityGate(spark, dir).queryExecution.executedPlan.toString
    assert(!gatePlan.contains("SortMergeJoin") && !gatePlan.contains("ShuffledHashJoin"),
      "scalar threshold must broadcast, never reshuffle the corpus")
  }

  /** Writes `df` as `documents.parquet` under a temp dir and calls f. */
  private def withTempParquetDir[T](df: org.apache.spark.sql.DataFrame)(f: String => T): T = {
    val tmp = java.nio.file.Files.createTempDirectory("corpus-spec").toString
    try { df.write.parquet(s"$tmp/documents.parquet"); f(tmp) }
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }
}
