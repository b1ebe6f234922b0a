package graft

import graft.core.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // hot key: 9000 of 10000 rows share key 1
    val fact = spark.range(10000)
      .select(when(col("id") < 9000, 1L).otherwise(col("id")).as("key"),
        col("id").as("payload"))
    val dim = Seq((1L, "hot"), (9500L, "cold")).toDF("key", "label")
    val plain = fact.join(dim, Seq("key")).select("payload", "label")
      .as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "key", 8, Seq(col("payload")))
      .select("payload", "label").as[(Long, String)].collect().toSet
    assert(salted == plain)
    assert(salted.count(_._2 == "hot") == 9000)
  }

  test("salt is deterministic and bounded") {
    val s = spark.range(100).select(Skew.salt(8, col("id")).as("s"))
      .as[Int].collect()
    assert(s.forall(v => v >= 0 && v < 8))
    val s2 = spark.range(100).select(Skew.salt(8, col("id")).as("s"))
      .as[Int].collect()
    assert(s.toSeq == s2.toSeq)
  }
}
