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

  test("ML-composed MinHashLSH agrees with the hand-rolled version on planted dups") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " other1 other2"
    val unrelated = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> unrelated)
    val ml = Dedup.minhashLshMl(d, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(ml.contains((1L, 2L)))
    assert(!ml.exists(p => p._1 == 3L || p._2 == 3L))
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

  test("simhashPairs: near-identical docs within hamming 3, unrelated not paired") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 59).map(i => s"tok$i").mkString(" ") + " other"
    val far = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val d = docs(1L -> base, 2L -> near, 3L -> far, 4L -> base)
    val pairs = Dedup.simhashPairs(d, 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // identical => hamming 0
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("embedding near-dups + canonical clusters") {
    val v = Seq.tabulate(8)(i => (i + 1).toFloat)
    val emb = Seq(
      (1L, v), (2L, v.updated(0, 1.01f)), (3L, v.updated(1, 2.01f)),
      (4L, Seq.tabulate(8)(i => if (i % 2 == 0) -1f else 1f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(emb, 0.99)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val clusters = Dedup.canonicalClusters(
      pairs.toSeq.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("canonical clusters: chain graph converges to min label") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val c = Dedup.canonicalClusters(chain).as[(Long, Long)].collect().toMap
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
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

  test("IVF ANN: identical vector found at rank 1; results subset of brute force") {
    val emb = (0L until 40L).map(i =>
      (i, Seq.tabulate(8)(d => math.cos(i * 13 + d * 3).toFloat))).toDF("vec_id", "embedding")
      .union(Seq((99L, Seq.tabulate(8)(d => math.cos(0 * 13 + d * 3).toFloat)))
        .toDF("vec_id", "embedding"))
    val ivf = Similarity.ivfAnn(emb, nQueries = 2, k = 3, nCentroids = 4, nProbe = 2)
      .as[(Long, Long, Int)].collect()
    // vec 99 duplicates vec 0 => must be query 0's rank-1 neighbor
    assert(ivf.exists(r => r._1 == 0L && r._2 == 99L && r._3 == 1))
    val brute = Similarity.cosineTopK(emb, 2, 10)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    assert(ivf.forall(r => brute.contains((r._1, r._2))))
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
