package graft

import graft.operators.{Dedup, IndexStore, Similarity}
import org.apache.spark.sql.functions._

/** Every parquet-backed index path must produce output EQUAL to its
  * inline (localCheckpoint) twin — the index is a durability change,
  * never a semantics change. Fixtures are the real sf0.001 tables so
  * the comparison covers non-trivial band/bucket distributions.
  */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(kind: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"idx_$kind").toString
    s"$d/index"
  }

  test("minhash band index roundtrips and the indexed incremental equals the inline path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val newDocs = docs.filter(col("doc_id") < 10)
    val corpus = docs.filter(col("doc_id") >= 10)
    val path = tmp("minhash")
    IndexStore.buildMinhashIndex(corpus, path)
    val loaded = IndexStore.loadMinhashIndex(spark, path)
    // the stored index IS the band frame
    val inlineBands = Dedup.minhashBands(corpus)
      .as[(Long, Int, Long)].collect().toSet
    assert(loaded.as[(Long, Int, Long)].collect().toSet == inlineBands)

    val indexed = Dedup.minhashLshIncrementalIndexed(newDocs, corpus, loaded, 0.5)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    val inline = Dedup.minhashLshIncremental(newDocs, corpus, 0.5)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(indexed == inline && indexed.nonEmpty)
  }

  test("simhash signature index roundtrips and banded pairs from it equal the inline path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val path = tmp("simhash")
    IndexStore.buildSimhashIndex(docs, path)
    val fromIndex = IndexStore.simhashPairsFromIndex(spark, path, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val inline = Dedup.simhashPairs(docs, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(fromIndex == inline && fromIndex.nonEmpty)
  }

  test("LSH ANN from a loaded bucket index equals the inline search") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val path = tmp("lsh")
    IndexStore.buildLshIndex(emb, path)
    val fromIndex = IndexStore.lshAnnFromIndex(emb, spark, path, nQueries = 10, k = 5)
      .as[(Long, Long, Int)].collect().toSet
    val inline = Similarity.lshAnn(emb, nQueries = 10, k = 5)
      .as[(Long, Long, Int)].collect().toSet
    assert(fromIndex == inline && fromIndex.nonEmpty)
  }

  test("IVF ANN from loaded assignments + centroids equals the inline search") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val path = tmp("ivf")
    IndexStore.buildIvfIndex(emb, path, nCentroids = 8)
    val (assigned, centroids) = IndexStore.loadIvfIndex(spark, path)
    assert(centroids.size == 8 && centroids.forall(_._2.nonEmpty))
    val fromIndex = Similarity.ivfSearch(emb, assigned, centroids, nQueries = 10, k = 5)
      .as[(Long, Long, Int)].collect().toSet
    val inline = Similarity.ivfAnn(emb, nQueries = 10, k = 5)
      .as[(Long, Long, Int)].collect().toSet
    assert(fromIndex == inline && fromIndex.nonEmpty)
  }
}
