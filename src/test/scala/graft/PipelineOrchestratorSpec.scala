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

    // full 17-column gene-signature export shape (one row, dataset Mini)
    val geneSig = Seq(("ENSG1.5", "d1", "Mini", "lung", Some(0.01)))
      .toDF("gene", "compound", "dataset", "tissue", "fdr_permutation")
      .withColumn("estimate", lit(0.5)).withColumn("lower_analytic", lit(0.1))
      .withColumn("upper_analytic", lit(0.9)).withColumn("lower_permutation", lit(0.1))
      .withColumn("upper_permutation", lit(0.9)).withColumn("n", lit(10))
      .withColumn("pvalue_analytic", lit(0.05)).withColumn("pvalue_permutation", lit(0.04))
      .withColumn("df", lit(8)).withColumn("fdr_analytic", lit(0.2))
      .withColumn("significant_permutation", lit(1)).withColumn("mDataType", lit("rna"))

    val cfg = PipelineConfig(
      rawDir = root,
      workDir = Files.createTempDirectory("orch-work").toString,
      finalDir = Files.createTempDirectory("orch-final").toString,
      psetNames = Seq("Mini"),
      cellosaurusPath = Some(cello.toString),
      cellSynonymMeta = Some(Seq(("c1", "c1_alias"))
        .toDF("unique.cellid", "Mini.cellid")),
      tissueSynonymMeta = Some(Seq(("lung", "lung_alias"))
        .toDF("unique.tissueid", "Mini.tissueid")),
      compoundSynonymMeta = Some(Seq(("d1", "d1_syn"))
        .toDF("unique.drugid", "Mini.drugid")),
      gctSignature = Some(Seq(("ENSG1", "lung", "d1", 0.9, 0.5, "AAC", "rna"))
        .toDF("Gene", "Tissue", "Drug", "FWER_genes", "estimate", "sens_stat", "mDataType")),
      gcdSignature = Some(Seq(("ENSG1", "d1", "Mini", 0.7, "rna"))
        .toDF("gene", "compound", "dataset", "estimate", "mDataType")),
      geneSignatures = Some(geneSig),
      gencode = Some(Seq(("ENSG1.7", "GENE-ONE", 100L, 200L, "+", "chr1"))
        .toDF("gene_id", "gene_name", "start", "end", "strand", "seqnames")),
      chemblTargets = Some(Seq(("TargetA", 1L, "P001"))
        .toDF("name", "compound_id", "uniprot_id")),
      drugbankTargets = Some(Seq(("TargetB", "d1_syn", "P002"))
        .toDF("name", "compound_name", "uniprot_id")),
      uniprotToEnsembl = Some(Seq(("P001", "ENSG1"), ("P002", "ENSG1"))
        .toDF("uniprot_id", "ensembl_id")),
      clinicalStudies = Some(Seq(("NCT1", "http://x", "Recruiting", "d1_syn"))
        .toDF("nct", "link", "status", "compound_name")))

    val meta = Seq(("d1", "UID1")).toDF("name", "compound_uid")
    val tables = Pipeline.run(spark, cfg, meta)

    // golden-check: one call yields the COMPLETE table set a reference
    // user gets from build_all + combine_all + synonym/meta/target/
    // trial builders
    assert(tables.keySet == Set(
      "tissue", "gene", "dataset", "compound", "cell", "compound_annotation",
      "gene_annotation", "dataset_cell", "dataset_tissue", "dataset_compound",
      "mol_cell", "dataset_statistics", "experiment", "dose_response", "profile",
      "cell_synonym", "tissue_synonym", "compound_synonym", "cellosaurus",
      "gene_compound_tissue", "gene_compound_dataset",
      "gene_compound_tissue_dataset", "target", "compound_target",
      "gene_target", "clinical_trial", "compound_trial"))
    assert(tables("cell_synonym").filter(col("cell_name") === "c1_alias").count() == 1)
    assert(tables("cellosaurus").filter(col("identifier") === "c1").count() == 1)

    // phase 5: signature facts mapped to the consolidated surrogate ids
    assert(tables("gene_compound_tissue").select("gene_id", "compound_id")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 1L)))
    assert(tables("gene_compound_dataset").select("gene_id", "dataset_id")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 1L)))
    assert(tables("gene_compound_tissue_dataset").select("permutation_done")
      .as[Int].collect().toSeq == Seq(1))
    // gencode enrichment lands on gene_annotation without mangling rows
    assert(tables("gene_annotation")
      .filter(col("symbol") === "GENE-ONE").count() == 1)

    // phase 6: targets + trials resolve through compound_synonym
    assert(tables("target").select("name").as[String].collect().toSet ==
      Set("TargetA", "TargetB"))
    assert(tables("compound_target").count() == 2) // chembl direct + drugbank via synonym
    assert(tables("gene_target").select("gene_id").distinct()
      .as[Long].collect().toSeq == Seq(1L))
    assert(tables("clinical_trial").count() == 1)
    assert(tables("compound_trial").select("compound_id")
      .as[Long].collect().toSeq == Seq(1L))

    // final tables exist as parquet on disk
    for (n <- Seq("cell_synonym", "gene_compound_tissue", "target", "clinical_trial"))
      assert(new java.io.File(s"${cfg.finalDir}/$n.parquet").exists(), n)
  }

  test("resumePerPset skips completed PSets and rebuilds after a crash (no marker)") {
    val root = Files.createTempDirectory("orch-r").toString
    val dir = new java.io.File(s"$root/Mini_PSet"); dir.mkdirs()
    def w(n: String, s: String): Unit =
      Files.writeString(java.nio.file.Paths.get(dir.getPath, n), s)
    w("cell.csv", "cellid,tissueid\nc1,lung\n")
    w("drug.csv", "drugid,smiles,inchikey,cid,FDA\nd1,CC,IK1,1.0,true\n")
    w("sensitivity$info.csv", ".rownames,cellid,drugid\ne1,c1,d1\n")
    w("sensitivity$raw.Dose.csv", ".exp_id,doses1\ne1,0.5\n")
    w("sensitivity$raw.Viability.csv", ".exp_id,doses1\ne1,42.0\n")
    w("sensitivity$profiles.csv",
      ".rownames,aac_recomputed,ic50_recomputed,HS,einf,ec50,DSS1,DSS2,DSS3\ne1,0.5,0.3,1,0.1,0.2,1,2,3\n")
    w("molecularProfiles$rna$rowData.csv", ".features\nENSG1.2\n")
    w("molecularProfiles$rna$colData.csv", "cellid\nc1\n")
    val cfg = PipelineConfig(
      rawDir = root,
      workDir = Files.createTempDirectory("orch-r-work").toString,
      finalDir = Files.createTempDirectory("orch-r-final").toString,
      psetNames = Seq("Mini"))
    val meta = Seq(("d1", "UID1")).toDF("name", "compound_uid")
    val probe = new java.io.File(s"${cfg.workDir}/Mini/Mini_cell.parquet")
    val marker = new java.io.File(s"${cfg.workDir}/Mini/_graft_pset_done")

    val first = Pipeline.run(spark, cfg, meta, resumePerPset = true)
    assert(marker.exists(), "marker stamped after the PSet's tables commit")
    val mtime1 = probe.lastModified()
    val cells1 = first("cell").collect().map(_.toString).toSeq

    // resumed run: phase 1 untouched, consolidated output identical
    val second = Pipeline.run(spark, cfg, meta, resumePerPset = true)
    assert(probe.lastModified() == mtime1, "completed PSet must be skipped")
    assert(second("cell").collect().map(_.toString).toSeq == cells1)

    // crash simulation: tables present but no marker -> full rebuild
    Thread.sleep(1100) // parquet dir mtime has second granularity on some fs
    assert(marker.delete())
    Pipeline.run(spark, cfg, meta, resumePerPset = true)
    assert(probe.lastModified() > mtime1, "unmarked PSet must rebuild")
    assert(marker.exists(), "rebuild re-stamps")

    // default (resume off) always rebuilds
    Thread.sleep(1100)
    val mtime2 = probe.lastModified()
    Pipeline.run(spark, cfg, meta)
    assert(probe.lastModified() > mtime2)
  }
}
