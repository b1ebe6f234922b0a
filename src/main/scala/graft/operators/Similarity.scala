package graft.operators

import graft.core.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`, driver north star — no reference equivalent).
  *
  * Scale design:
  *  - brute-force top-k broadcasts the (small) query set and streams
  *    the corpus once: cost O(|corpus| * |queries| * dim), no corpus
  *    shuffle, ranks resolved with a per-query window over only
  *    |queries| * |corpus| candidate rows (prunable with a per-query
  *    top-k aggregate at higher scale);
  *  - the LSH variant buckets by random-hyperplane sign bits so each
  *    corpus vector joins only its bucket — candidate generation is an
  *    equi-join on a 32-bit key, the 100 TB path.
  *  - dot products use built-in higher-order functions (zip_with +
  *    aggregate) — codegen'd, no UDF.
  */
object Similarity {

  type Q = (SparkSession, String) => DataFrame

  /** embedding cast float->double once, with precomputed L2 norm. */
  def withNorm(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("norm",
        sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Brute-force cosine top-k for queries vec_id < nQueries. */
  def cosineTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = withNorm(emb)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("norm").as("cn"))
    val sims = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
    sims.withColumn("rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  val simCosineTopK: Q = (s, dir) =>
    cosineTopK(t(s, dir, "embeddings"), nQueries = 10, k = 5)
      .orderBy("query_id", "rank")

  /** Scale-path brute force: the native codegen'd
    * [[graft.functions.CosineSimilarity]] expression (no per-element
    * lambda interpretation, no intermediate arrays) + the
    * [[graft.functions.TopK]] aggregator (partial per-key top-k: map
    * tasks emit <= k rows per query before the shuffle, so shuffle
    * volume is O(queries * k), not O(corpus * queries) as with the
    * window-rank formulation). Result is bit-identical to
    * [[cosineTopK]] — same accumulation order — so it shares the
    * DuckDB oracle. */
  def cosineTopKNative(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    import emb.sparkSession.implicits._
    import graft.functions.{CosineSimilarity, TopK}
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val cands = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        CosineSimilarity.cosineSim(col("q_emb"), col("embedding")).as("sim"))
      .as[(Long, Long, Double)]
    cands.groupByKey(_._1)
      .mapValues(r => (r._3, r._2))
      .agg(new TopK(k).toColumn.name("top"))
      .flatMap { case (qid, items) =>
        items.zipWithIndex.map { case ((_, nid), i) => (qid, nid, i + 1) }
      }
      .toDF("query_id", "neighbor_id", "rank")
  }

  val simCosineTopKNative: Q = (s, dir) =>
    cosineTopKNative(t(s, dir, "embeddings"), nQueries = 10, k = 5)
      .orderBy("query_id", "rank")

  val NumPlanes = 16

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 scaled to [-0.5, 0.5). */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(1000000L)).cast(DoubleType) / 1000000.0) - 0.5

  /** Sign-bit LSH bucket id over NumPlanes random hyperplanes. */
  def lshBucket(v: Column): Column =
    (0 until NumPlanes).map { p =>
      val d = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: queries join only their own bucket. Recall is
    * partial by construction (checked in ScalaTest against brute
    * force); rows-only driver check. */
  def lshAnn(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = withNorm(emb).withColumn("bucket", lshBucket(col("v")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qn"), col("bucket"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
      col("norm").as("cn"), col("bucket"))
    val sims = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
    sims.withColumn("rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  val simLshAnn: Q = (s, dir) =>
    lshAnn(t(s, dir, "embeddings"), nQueries = 10, k = 5)
      .orderBy("query_id", "rank")

  val queries: Map[String, Q] = Map(
    "x_sim_cosine_topk" -> simCosineTopK,
    "x_sim_cosine_topk_native" -> simCosineTopKNative,
    "x_sim_lsh_ann" -> simLshAnn)

  private val cosineTopKOracle: String =
    ("WITH sims AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
      "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS sim " +
      "FROM embeddings q, embeddings c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) " +
      "SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM " +
      "(SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM sims) " +
      "WHERE rank <= 5 ORDER BY query_id, rank")

  val oracles: Map[String, String] = Map(
    "x_sim_cosine_topk_native" -> cosineTopKOracle,
    "x_sim_cosine_topk" ->
      ("WITH sims AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
        "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS sim " +
        "FROM embeddings q, embeddings c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) " +
        "SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM " +
        "(SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM sims) " +
        "WHERE rank <= 5 ORDER BY query_id, rank"))
}
