package graft

import graft.pset._
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** End-to-end orchestrator spec: raw exports -> Pipeline.run ->
  * consolidated + synonym + cellosaurus tables in one call. */
class PipelineOrchestratorSpec extends SparkSpec {
  import spark.implicits._

  test("Pipeline.run produces consolidated, synonym and cellosaurus tables") {
    val root = Files.createTempDirectory("orch").toString
    val dir = new java.io.File(s"$root/Mini_PSet"); dir.mkdirs()
    def w(n: String, s: String): Unit =
      Files.writeString(java.nio.file.Paths.get(dir.getPath, n), s)
    w("cell.csv", "cellid,tissueid\nc1,lung\nc2,breast\n")
    w("drug.csv", "drugid,smiles,inchikey,cid,FDA\nd1,CC,IK1,1.0,true\n")
    w("sensitivity$info.csv", ".rownames,cellid,drugid\ne1,c1,d1\n")
    w("sensitivity$raw.Dose.csv", ".exp_id,doses1\ne1,0.5\n")
    w("sensitivity$raw.Viability.csv", ".exp_id,doses1\ne1,42.0\n")
    w("sensitivity$profiles.csv",
      ".rownames,aac_recomputed,ic50_recomputed,HS,einf,ec50,DSS1,DSS2,DSS3\ne1,0.5,0.3,1,0.1,0.2,1,2,3\n")
    w("molecularProfiles$rna$rowData.csv", ".features\nENSG1.2\n")
    w("molecularProfiles$rna$colData.csv", "cellid\nc1\n")

    val cello = Files.createTempFile("cello", ".txt")
    Files.writeString(cello,
      ((1 to 55).map(i => s"h$i") ++
        Seq("ID   c1", "AC   CVCL_9", "CA   line", "//")).mkString("\n") + "\n")

    val cfg = PipelineConfig(
      rawDir = root,
      workDir = Files.createTempDirectory("orch-work").toString,
      finalDir = Files.createTempDirectory("orch-final").toString,
      psetNames = Seq("Mini"),
      cellosaurusPath = Some(cello.toString),
      cellSynonymMeta = Some(Seq(("c1", "c1_alias"))
        .toDF("unique.cellid", "Mini.cellid")))

    val meta = Seq(("d1", "UID1")).toDF("name", "compound_uid")
    val tables = Pipeline.run(spark, cfg, meta)

    assert(tables.keySet.intersect(Set("cell", "experiment", "dose_response",
      "profile", "cell_synonym", "cellosaurus")).size == 6)
    assert(tables("cell_synonym").filter(col("cell_name") === "c1_alias").count() == 1)
    assert(tables("cellosaurus").filter(col("identifier") === "c1").count() == 1)
    // final tables exist as parquet on disk
    assert(new java.io.File(s"${cfg.finalDir}/cell_synonym.parquet").exists())
  }
}
