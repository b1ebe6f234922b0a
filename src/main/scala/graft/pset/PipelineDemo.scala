package graft.pset

import org.apache.spark.sql.SparkSession

/** Executable example of the PharmacoDI-parity pipeline: synthesizes a
  * mini PSet in the rPharmacoDI export layout, runs read -> per-PSet
  * build -> consolidate, and prints the final tables. Run with
  * `sbt "runMain graft.pset.PipelineDemo"`.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("demo-psets").toString
    val dir = new java.io.File(s"$root/Demo_PSet"); dir.mkdirs()
    def w(n: String, s: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dir.getPath, n), s)
    w("cell.csv", "cellid,tissueid\nc1,lung\nc2,breast\n")
    w("drug.csv", "drugid,smiles,inchikey,cid,FDA\nd1,CC,IK1,5757.0,true\n")
    w("sensitivity$info.csv", ".rownames,cellid,drugid\ne1,c1,d1\ne2,c2,d1\n")
    w("sensitivity$raw.Dose.csv", ".exp_id,doses1,doses2\ne1,0.1,0.2\ne2,0.3,NA\n")
    w("sensitivity$raw.Viability.csv", ".exp_id,doses1,doses2\ne1,99.0,55.0\ne2,88.0,NA\n")
    w("sensitivity$profiles.csv",
      ".rownames,aac_recomputed,ic50_recomputed,HS,einf,ec50,DSS1,DSS2,DSS3\n" +
        "e1,0.5,0.3,1.0,0.1,0.2,1,2,3\ne2,0.6,1e60,1.1,0.2,0.3,4,5,6\n")
    w("molecularProfiles$rna$rowData.csv", ".features\nENSG1.5\nENSG2.1\n")
    w("molecularProfiles$rna$colData.csv", "cellid\nc1\nc2\n")

    val cfg = PipelineConfig(
      rawDir = root,
      workDir = java.nio.file.Files.createTempDirectory("demo-out").toString,
      finalDir = java.nio.file.Files.createTempDirectory("demo-final").toString,
      psetNames = Seq("Demo"),
      cellSynonymMeta = Some(Seq(("c1", "c1_alias")).toDF("unique.cellid", "Demo.cellid")))
    val meta = Seq(("d1", "UID1")).toDF("name", "compound_uid")
    val tables = Pipeline.run(spark, cfg, meta,
      (what, df) => {
        val n = df.count()
        if (n > 0) println(s"AUDIT $what unmatched=$n")
      })
    println("TABLES=" + tables.keys.toSeq.sorted.mkString(","))
    tables("experiment").show()
    tables("dose_response").show()
    tables("profile").show()
    println("PIPELINE_DEMO_OK")
    spark.stop()
  }
}
