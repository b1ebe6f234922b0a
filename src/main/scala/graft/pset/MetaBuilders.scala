package graft.pset

import graft.core.{Harmonize, Ids}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Meta/statistics tables from gene-signature exports
  * (/root/reference/PharmacoDI/build_meta_tables.py,
  * build_gene_compound_tissue_dataset_tables.py).
  *
  * The reference's three near-identical builders collapse into a
  * generic declared-pad + update-join chain. All dimension mappings
  * broadcast; the gene-signature fact (10+ GB in production, read
  * out-of-core there) streams through one scan per build with zero
  * join shuffles — only the final semantic sort shuffles.
  */
object MetaBuilders {

  /** Update-join (utilities.py:54-83): replace the natural key in
    * `keyCol` with the dim's id via a broadcast left join; unmatched
    * rows keep a null id (callers decide whether to drop). */
  def updateJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
      dimName: String = "name"): DataFrame =
    fact.withColumnRenamed(keyCol, "__nat")
      .join(broadcast(dim.select(col(dimName).as("__nat"), col("id").as("__id"))),
        Seq("__nat"), "left")
      .drop("__nat")
      .withColumnRenamed("__id", keyCol)

  private def declaredPad(df: DataFrame, columns: Seq[(String, DataType)]): DataFrame =
    Harmonize.harmonize(df, StructType(columns.map { case (n, t) => StructField(n, t) }))

  private val gctStats: Seq[(String, DataType)] = Seq(
    "estimate" -> DoubleType, "lower" -> DoubleType, "upper" -> DoubleType,
    "n" -> IntegerType, "tstat" -> DoubleType, "fstat" -> DoubleType,
    "pvalue" -> DoubleType, "df" -> IntegerType, "fdr" -> DoubleType,
    "FWER_gene" -> DoubleType, "FWER_compound" -> DoubleType,
    "FWER_all" -> DoubleType, "BF_p_all" -> DoubleType,
    "sens_stat" -> StringType, "mDataType" -> StringType,
    "tested_in_human_trials" -> BooleanType, "in_clinical_trials" -> BooleanType)

  /** gene_compound_tissue (build_meta_tables.py:24-113): rename the
    * signature export's columns, pad the declared schema, map
    * gene/compound/tissue names to surrogate ids (genes must all map —
    * hard error, :80-82), sort, dense id. */
  def buildGeneCompoundTissue(gct: DataFrame, gene: DataFrame,
      compound: DataFrame, tissue: DataFrame): DataFrame = {
    val renames = Map("Gene" -> "gene_id", "Tissue" -> "tissue_id",
      "Drug" -> "compound_id", "FWER_genes" -> "FWER_gene")
    val renamed = renames.foldLeft(gct) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    val padded = declaredPad(renamed,
      Seq("gene_id" -> StringType, "compound_id" -> StringType,
        "tissue_id" -> StringType) ++ gctStats)
    val geneMapped = updateJoin(padded, gene, "gene_id")
    val failed = geneMapped.filter(col("gene_id").isNull).count()
    require(failed == 0, s"$failed gene_compound_tissue genes failed to map!")
    val mapped = updateJoin(updateJoin(geneMapped, compound, "compound_id"),
      tissue, "tissue_id")
    val declared = Seq("gene_id", "compound_id", "tissue_id") ++ gctStats.map(_._1)
    Ids.denseId(mapped.select(declared.head, declared.tail: _*),
      Seq(col("gene_id"), col("compound_id"), col("tissue_id"), col("mDataType")))
  }

  private val gcdStats: Seq[(String, DataType)] = Seq(
    "estimate" -> DoubleType, "lower_analytic" -> DoubleType,
    "upper_analytic" -> DoubleType, "lower_permutation" -> DoubleType,
    "upper_permutation" -> DoubleType, "n" -> IntegerType,
    "pvalue_analytic" -> DoubleType, "pvalue_permutation" -> DoubleType,
    "df" -> IntegerType, "fdr_analytic" -> DoubleType,
    "fdr_permutation" -> DoubleType, "significant_permutation" -> IntegerType,
    "permutation_done" -> IntegerType, "sens_stat" -> StringType,
    "mDataType" -> StringType)

  /** Compound-name patch (build_meta_tables.py:199-208): corrected
    * compound names per (name, dataset), with GDSC dataset renames,
    * applied as a composite-key update-join only where matched. */
  def applyCompoundNamePatch(fact: DataFrame, patch: DataFrame): DataFrame = {
    val fixed = patch
      .withColumn("dataset",
        when(col("dataset") === "GDSC_2020(v1-8.2)", "GDSC_v1")
          .when(col("dataset") === "GDSC_2020(v2-8.2)", "GDSC_v2")
          .otherwise(col("dataset")))
      .select(col("drugid").as("compound_id"),
        col("`unique.drugid`").as("fixed_name"),
        col("dataset").as("dataset_id"))
    fact.join(broadcast(fixed), Seq("compound_id", "dataset_id"), "left")
      .withColumn("compound_id", coalesce(col("fixed_name"), col("compound_id")))
      .drop("fixed_name")
  }

  /** gene_compound_dataset (build_meta_tables.py:120-236): rename,
    * drop significant/tissue, pad, sens_stat='AAC' +
    * permutation_done=0, map gene (warn+drop), patch compound names,
    * map compound (drop unmatched) and dataset, sort, dense id. */
  def buildGeneCompoundDataset(gcd: DataFrame, gene: DataFrame,
      compound: DataFrame, dataset: DataFrame,
      compoundNamePatch: Option[DataFrame] = None,
      audit: (String, Long) => Unit = (_, _) => ()): DataFrame = {
    val renames = Map("gene" -> "gene_id", "compound" -> "compound_id",
      "dataset" -> "dataset_id", "lower" -> "lower_analytic",
      "upper" -> "upper_analytic", "pvalue" -> "pvalue_analytic",
      "fdr" -> "fdr_analytic")
    val renamed = renames.foldLeft(gcd.drop("significant", "tissue")) {
      case (d, (from, to)) =>
        if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    val padded = declaredPad(renamed,
      Seq("gene_id" -> StringType, "compound_id" -> StringType,
        "dataset_id" -> StringType) ++ gcdStats)
      .withColumn("sens_stat", lit("AAC"))
      .withColumn("permutation_done", lit(0))
    val geneMapped = updateJoin(padded, gene, "gene_id")
    audit("gene_compound_dataset.gene", geneMapped.filter(col("gene_id").isNull).count())
    val geneOk = geneMapped.filter(col("gene_id").isNotNull)
    val patched = compoundNamePatch.map(applyCompoundNamePatch(geneOk, _)).getOrElse(geneOk)
    val compoundMapped = updateJoin(patched, compound, "compound_id")
    audit("gene_compound_dataset.compound",
      compoundMapped.filter(col("compound_id").isNull).count())
    val compoundOk = compoundMapped.filter(col("compound_id").isNotNull)
    val mapped = updateJoin(compoundOk, dataset, "dataset_id")
    val declared = Seq("gene_id", "compound_id", "dataset_id") ++ gcdStats.map(_._1)
    Ids.denseId(mapped.select(declared.head, declared.tail: _*),
      Seq(col("gene_id"), col("compound_id"), col("dataset_id"), col("mDataType")))
  }

  /** gene_compound_tissue_dataset consolidated across PSets: union the
    * per-PSet builds, map all four natural keys to surrogate ids
    * (gene/compound warn+drop, tissue/dataset update), sort, dense id
    * — completing the per-PSet builder into the final table the
    * reference assembles across its gene-signature exports. */
  def buildGeneCompoundTissueDataset(perPset: Seq[DataFrame], gene: DataFrame,
      compound: DataFrame, tissue: DataFrame, dataset: DataFrame,
      audit: (String, Long) => Unit = (_, _) => ()): DataFrame = {
    val all = perPset.reduce(_.unionByName(_, allowMissingColumns = true))
    val geneMapped = updateJoin(all, gene, "gene_id")
    audit("gctd.gene", geneMapped.filter(col("gene_id").isNull).count())
    val compoundMapped = updateJoin(
      geneMapped.filter(col("gene_id").isNotNull), compound, "compound_id")
    audit("gctd.compound", compoundMapped.filter(col("compound_id").isNull).count())
    val mapped = updateJoin(
      updateJoin(compoundMapped.filter(col("compound_id").isNotNull),
        tissue, "tissue_id"),
      dataset, "dataset_id")
    Ids.denseId(mapped.select(
      (Seq("gene_id", "compound_id", "dataset_id", "tissue_id").map(col) ++
        mapped.columns.filterNot(Seq("gene_id", "compound_id", "dataset_id",
          "tissue_id").contains).toSeq.map(col)): _*),
      Seq(col("gene_id"), col("compound_id"), col("dataset_id"),
        col("tissue_id"), col("mDataType")))
  }

  /** Genomic-coordinate enrichment of gene_annotation
    * (/root/reference/PharmacoDI/map_genes_to_genomic_coordinates.py:20-68):
    * resolve gene_id back to the Ensembl name via the gene table, join
    * the (version-stripped) Gencode annotation, and take
    * gene_seq_start/end, chr and symbol from it. Row-conservation
    * checked by the caller (reference raises on mangling). */
  def mapGenomicCoordinates(geneAnnotation: DataFrame, gene: DataFrame,
      gencode: DataFrame): DataFrame = {
    val gc = gencode
      .select(
        regexp_replace(col("gene_id"), "[.][0-9]*$", "").as("name"),
        col("gene_name").as("symbol"), col("start"), col("end"),
        col("strand"), col("seqnames"))
    geneAnnotation.drop("symbol")
      .join(broadcast(gene.select(col("id").as("gene_id"), col("name"))), Seq("gene_id"), "left")
      .join(broadcast(gc), Seq("name"), "left")
      .select(col("gene_id"), col("symbol"),
        col("start").as("gene_seq_start"),
        col("end").as("gene_seq_end"),
        col("seqnames").as("chr"),
        col("strand"))
  }

  /** gene_compound_tissue_dataset per PSet
    * (build_gene_compound_tissue_dataset_tables.py:49-94), with the
    * reference's discarded dataset filter applied as *intended*
    * (SURVEY.md §8): keep only this PSet's rows. permutation_done = 1
    * where fdr_permutation is present (:82). */
  def buildGeneCompoundTissueDatasetPerPset(geneSig: DataFrame, psetName: String): DataFrame =
    geneSig
      .filter(col("dataset") === psetName) // intended filter, fixed
      .select(
        regexp_replace(col("gene").cast(StringType), "\\..*$", "").as("gene_id"),
        col("compound").as("compound_id"),
        col("dataset").as("dataset_id"),
        col("tissue").as("tissue_id"),
        col("estimate"), col("lower_analytic"), col("upper_analytic"),
        col("lower_permutation"), col("upper_permutation"), col("n"),
        col("pvalue_analytic"), col("pvalue_permutation"), col("df"),
        col("fdr_analytic"), col("fdr_permutation"),
        col("significant_permutation"), col("mDataType"))
      .withColumn("permutation_done",
        when(col("fdr_permutation").isNotNull, 1).otherwise(0))
      .withColumn("sens_stat", lit("AAC"))
}
