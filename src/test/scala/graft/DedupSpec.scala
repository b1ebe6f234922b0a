package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("jaccardPairs: identical docs have jaccard 1.0, disjoint docs none") {
    val d = docs(
      1L -> "a b c d e f",
      2L -> "a b c d e f",
      3L -> "x y z w q r")
    val pairs = Dedup.jaccardPairs(Dedup.shingles(d), 0.5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(pairs == Set((1L, 2L, 1.0)))
  }

  test("minhash LSH finds planted near-duplicates and skips unrelated docs") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " other1 other2"
    val unrelated = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> unrelated)
    val found = Dedup.minhashLsh(d, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(found.contains((1L, 2L)))
    assert(!found.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs agree; token order does not matter; unrelated docs differ") {
    val d = docs(
      1L -> "alpha beta gamma delta",
      2L -> "delta gamma beta alpha",
      3L -> "completely different words here")
    val sig = Dedup.simhash(d).as[(Long, Long)].collect().toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("rolling hash is order-sensitive where fingerprint is not") {
    val d = docs(1L -> "a b c", 2L -> "c b a")
    val rh = d.select(
      aggregate(
        transform(split(trim(col("text")), "\\s+"), w => pmod(xxhash64(w), lit(1000000007L))),
        lit(0L),
        (acc, h) => pmod(acc * lit(31L) + h, lit(1000000000000000L))).as("h"))
      .as[Long].collect()
    assert(rh(0) != rh(1))
    val fp = d.select(md5(concat_ws(" ", array_sort(array_distinct(split(trim(col("text")), "\\s+"))))))
      .as[String].collect()
    assert(fp(0) == fp(1))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("brute-force cosine top-k ranks an identical vector first") {
    val v = Seq.tabulate(8)(i => (i + 1).toFloat)
    val near = v.updated(0, 1.1f)
    val far = Seq.tabulate(8)(i => if (i % 2 == 0) -1f else 1f)
    val d = emb(0L -> v, 5L -> v, 6L -> near, 7L -> far)
    val top = Similarity.cosineTopK(d, nQueries = 1, k = 3)
      .orderBy("rank").as[(Long, Long, Int)].collect()
    assert(top.head._2 == 5L) // identical vector is rank 1
    assert(top(1)._2 == 6L)   // near vector is rank 2
  }

  test("LSH ANN returns a subset consistent with brute force for same-bucket vectors") {
    val v = Seq.tabulate(8)(i => (i + 1).toFloat)
    val d = emb(0L -> v, 5L -> v, 6L -> v.updated(1, 2.2f))
    val ann = Similarity.lshAnn(d, nQueries = 1, k = 3)
      .as[(Long, Long, Int)].collect()
    // identical vectors always share a bucket => must be found as rank 1
    assert(ann.exists(r => r._2 == 5L && r._3 == 1))
  }
}
