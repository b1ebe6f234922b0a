package graft

import graft.pset.{EnrichmentBuilders, MetaBuilders}
import org.apache.spark.sql.functions._

class MetaBuildersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val gene = Seq((1L, "ENSG1"), (2L, "ENSG2")).toDF("id", "name")
  private lazy val compound = Seq((10L, "d1"), (20L, "d2")).toDF("id", "name")
  private lazy val tissue = Seq((100L, "lung")).toDF("id", "name")
  private lazy val dataset = Seq((5L, "GDSC_v1")).toDF("id", "name")

  test("gene_compound_tissue: rename + pad + FK update-joins + dense id") {
    val gct = Seq(
      ("ENSG1", "lung", "d1", 0.9, 0.5, "AAC", "rna"),
      ("ENSG2", "lung", "d2", 0.8, 0.4, "AAC", "rna"))
      .toDF("Gene", "Tissue", "Drug", "FWER_genes", "estimate", "sens_stat", "mDataType")
    val out = MetaBuilders.buildGeneCompoundTissue(gct, gene, compound, tissue)
    assert(out.columns.take(4).toSeq == Seq("id", "gene_id", "compound_id", "tissue_id"))
    val rows = out.select("id", "gene_id", "compound_id", "tissue_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(rows == Set((1L, 1L, 10L, 100L), (2L, 2L, 20L, 100L)))
    // padded stat columns exist and are null
    assert(out.select("tstat").filter(col("tstat").isNotNull).count() == 0)
  }

  test("gene_compound_tissue: unmapped gene is a hard error (build_meta_tables.py:80-82)") {
    val gct = Seq(("ENSG_UNKNOWN", "lung", "d1"))
      .toDF("Gene", "Tissue", "Drug")
    val err = intercept[IllegalArgumentException] {
      MetaBuilders.buildGeneCompoundTissue(gct, gene, compound, tissue)
    }
    assert(err.getMessage.contains("failed to map"))
  }

  test("gene_compound_dataset: compound-name patch + drops + constants") {
    val gcd = Seq(
      ("ENSG1", "d1-old-name", "GDSC_v1", 0.7, "rna"),
      ("ENSG2", "d2", "GDSC_v1", 0.6, "rna"),
      ("ENSG_BAD", "d2", "GDSC_v1", 0.5, "rna"))
      .toDF("gene", "compound", "dataset", "estimate", "mDataType")
    val patch = Seq(("d1-old-name", "d1", "GDSC_2020(v1-8.2)"))
      .toDF("drugid", "unique.drugid", "dataset")
    var audits = Map.empty[String, Long]
    val out = MetaBuilders.buildGeneCompoundDataset(gcd, gene, compound, dataset,
      Some(patch), (what, n) => audits += what -> n)
    assert(audits("gene_compound_dataset.gene") == 1L) // ENSG_BAD dropped
    val rows = out.select("gene_id", "compound_id", "dataset_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((1L, 10L, 5L), (2L, 20L, 5L))) // patch mapped d1-old-name -> d1
    assert(out.select("sens_stat").distinct().as[String].collect().toSeq == Seq("AAC"))
    assert(out.select("permutation_done").distinct().as[Int].collect().toSeq == Seq(0))
  }

  test("gctd consolidation: per-PSet union + 4-way FK map + dense id") {
    val sigA = Seq(("ENSG1.5", "d1", "PSetA", "lung", Some(0.01)))
      .toDF("gene", "compound", "dataset", "tissue", "fdr_permutation")
      .withColumn("estimate", lit(0.5)).withColumn("lower_analytic", lit(0.1))
      .withColumn("upper_analytic", lit(0.9)).withColumn("lower_permutation", lit(0.1))
      .withColumn("upper_permutation", lit(0.9)).withColumn("n", lit(10))
      .withColumn("pvalue_analytic", lit(0.05)).withColumn("pvalue_permutation", lit(0.04))
      .withColumn("df", lit(8)).withColumn("fdr_analytic", lit(0.2))
      .withColumn("significant_permutation", lit(1)).withColumn("mDataType", lit("rna"))
    val perA = MetaBuilders.buildGeneCompoundTissueDatasetPerPset(sigA, "PSetA")
    val ds = Seq((5L, "PSetA")).toDF("id", "name")
    val out = MetaBuilders.buildGeneCompoundTissueDataset(
      Seq(perA), gene, compound, tissue, ds)
    val row = out.select("id", "gene_id", "compound_id", "dataset_id", "tissue_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(row == Seq((1L, 1L, 10L, 5L, 100L)))
  }

  test("genomic coordinates: gencode version strip + join onto gene_annotation") {
    val annot = Seq((1L, null: String, null: java.lang.Long, null: java.lang.Long),
      (2L, null: String, null: java.lang.Long, null: java.lang.Long))
      .toDF("gene_id", "symbol", "gene_seq_start", "gene_seq_end")
    val gencode = Seq(("ENSG1.7", "GENE-ONE", 100L, 200L, "+", "chr1"))
      .toDF("gene_id", "gene_name", "start", "end", "strand", "seqnames")
    val out = MetaBuilders.mapGenomicCoordinates(annot, gene, gencode)
    assert(out.columns.toSeq ==
      Seq("gene_id", "symbol", "gene_seq_start", "gene_seq_end", "chr", "strand"))
    val row = out.filter(col("gene_id") === 1L).head()
    assert(row.getAs[String]("symbol") == "GENE-ONE" &&
      row.getAs[Long]("gene_seq_start") == 100L &&
      row.getAs[String]("chr") == "chr1")
    // unmapped gene keeps its row with null coordinates
    assert(out.filter(col("gene_id") === 2L).head().isNullAt(2))
  }

  test("gene_compound_tissue_dataset: intended dataset filter + permutation_done rule") {
    val sig = Seq(
      ("ENSG1.5", "d1", "PSetA", "lung", Some(0.01)),
      ("ENSG2.1", "d2", "PSetB", "lung", None))
      .toDF("gene", "compound", "dataset", "tissue", "fdr_permutation")
      .withColumn("estimate", lit(0.5)).withColumn("lower_analytic", lit(0.1))
      .withColumn("upper_analytic", lit(0.9)).withColumn("lower_permutation", lit(0.1))
      .withColumn("upper_permutation", lit(0.9)).withColumn("n", lit(10))
      .withColumn("pvalue_analytic", lit(0.05)).withColumn("pvalue_permutation", lit(0.04))
      .withColumn("df", lit(8)).withColumn("fdr_analytic", lit(0.2))
      .withColumn("significant_permutation", lit(1)).withColumn("mDataType", lit("rna"))
    val out = MetaBuilders.buildGeneCompoundTissueDatasetPerPset(sig, "PSetA")
    val rows = out.select("gene_id", "dataset_id", "permutation_done")
      .as[(String, String, Int)].collect().toSeq
    assert(rows == Seq(("ENSG1", "PSetA", 1))) // version stripped, filter applied, fdr present
  }
}

class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  private lazy val chembl = Seq(
    ("TargetA", 10L, "P001"), ("TargetB", 20L, "P002"))
    .toDF("name", "compound_id", "uniprot_id")
  private lazy val drugbank = Seq(
    ("TargetB", "aspirin", "P002"), ("TargetC", "unknown-drug", "P003"))
    .toDF("name", "compound_name", "uniprot_id")
  private lazy val synonyms = Seq(("aspirin", 10L)).toDF("compound_name", "compound_id")

  test("target: union + dedup + dense id") {
    val t = EnrichmentBuilders.buildTarget(chembl, drugbank)
    val names = t.orderBy("id").select("name").as[String].collect().toSeq
    assert(names == Seq("TargetA", "TargetB", "TargetC"))
  }

  test("compound_target: chembl direct + drugbank via synonyms, unmatched dropped") {
    val t = EnrichmentBuilders.buildTarget(chembl, drugbank)
    val ct = EnrichmentBuilders.buildCompoundTarget(chembl, drugbank, t, synonyms)
    val ids = t.select("name", "id").as[(String, Long)].collect().toMap
    val rows = ct.select("target_id", "compound_id").as[(Long, Long)].collect().toSet
    // TargetC's drug has no synonym row => dropped
    assert(rows == Set((ids("TargetA"), 10L), (ids("TargetB"), 20L), (ids("TargetB"), 10L)))
  }

  test("gene_target: uniprot->ensembl mapping joins through to gene ids") {
    val t = EnrichmentBuilders.buildTarget(chembl, drugbank)
    val mapping = Seq(("P001", "ENSG1"), ("P003", "ENSG2")).toDF("uniprot_id", "ensembl_id")
    val gene = Seq((1L, "ENSG1"), (2L, "ENSG2")).toDF("id", "name")
    val gt = EnrichmentBuilders.buildGeneTarget(chembl, drugbank, t, mapping, gene)
    val ids = t.select("name", "id").as[(String, Long)].collect().toMap
    val rows = gt.select("target_id", "gene_id").as[(Long, Long)].collect().toSet
    assert(rows == Set((ids("TargetA"), 1L), (ids("TargetC"), 2L)))
  }

  test("clinical trials: nct dedup + compound links") {
    val studies = Seq(
      ("NCT1", "http://a", "Recruiting", "aspirin"),
      ("NCT1", "http://a", "Recruiting", "aspirin"), // dup row
      ("NCT2", "http://b", "Completed", "aspirin"),
      ("NCT3", "http://c", "Completed", "unknown-drug"))
      .toDF("nct", "link", "status", "compound_name")
    val (trials, compoundTrial) =
      EnrichmentBuilders.buildClinicalTrialTables(studies, synonyms)
    assert(trials.count() == 3)
    assert(trials.columns.toSeq ==
      Seq("clinical_trial_id", "nct", "link", "status"))
    val links = compoundTrial.as[(Long, Long)].collect().toSet
    val nctToId = trials.select("nct", "clinical_trial_id").as[(String, Long)].collect().toMap
    // unknown-drug has no synonym => NCT3 not linked
    assert(links == Set((nctToId("NCT1"), 10L), (nctToId("NCT2"), 10L)))
  }
}
