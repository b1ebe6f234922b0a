package graft.pset

import graft.core.Ids
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** External-enrichment tables (targets, clinical trials). Network
  * sources (ChEMBL / DrugBank / UniProt / clinicaltrials.gov —
  * SURVEY.md §2.1 S10-S12) stay outside the engine: these builders
  * consume pre-fetched snapshots as input DataFrames, exactly as the
  * reference consumes its API dumps
  * (/root/reference/PharmacoDI/build_target_tables.py:41-59).
  */
object EnrichmentBuilders {

  /** target (build_target_tables.py:62-79): union of ChEMBL + DrugBank
    * target names, dedup, dense id. */
  def buildTarget(chembl: DataFrame, drugbank: DataFrame): DataFrame =
    Ids.denseId(
      chembl.select("name").unionByName(drugbank.select("name")).distinct(),
      Seq(col("name")))

  /** compound_target (build_target_tables.py:83-122): ChEMBL rows carry
    * compound_id directly; DrugBank rows resolve compound_name through
    * the synonym table; union, map target name -> id, drop unmatched,
    * dedup. */
  def buildCompoundTarget(chembl: DataFrame, drugbank: DataFrame,
      target: DataFrame, compoundSynonyms: DataFrame): DataFrame = {
    val syn = compoundSynonyms.select("compound_name", "compound_id").distinct()
    val fromDrugbank = drugbank.select("name", "compound_name")
      .join(syn, Seq("compound_name"))
      .select("name", "compound_id")
    val all = chembl.select("name", "compound_id").unionByName(fromDrugbank)
      .withColumnRenamed("name", "target_name").dropDuplicates()
    all.join(broadcast(target.select(col("name").as("target_name"),
        col("id").as("target_id"))), Seq("target_name"))
      .select("target_id", "compound_id")
      .na.drop().dropDuplicates()
  }

  /** gene_target (build_target_tables.py:126-171): target-uniprot
    * pairs joined through a uniprot->ensembl mapping table (pre-fetched
    * — the reference hits the UniProt API), then mapped to gene and
    * target surrogate ids; unmatched rows dropped; dedup. */
  def buildGeneTarget(chembl: DataFrame, drugbank: DataFrame, target: DataFrame,
      uniprotToEnsembl: DataFrame, gene: DataFrame): DataFrame = {
    val pairs = chembl.select("name", "uniprot_id")
      .unionByName(drugbank.select("name", "uniprot_id"))
      .withColumnRenamed("name", "target_name").dropDuplicates()
    pairs
      .join(broadcast(uniprotToEnsembl.select("uniprot_id", "ensembl_id").distinct()),
        Seq("uniprot_id"))
      .join(broadcast(gene.select(col("name").as("ensembl_id"), col("id").as("gene_id"))),
        Seq("ensembl_id"))
      .join(broadcast(target.select(col("name").as("target_name"), col("id").as("target_id"))),
        Seq("target_name"))
      .select("target_id", "gene_id")
      .dropDuplicates()
  }

  /** clinical_trial + compound_trial
    * (build_clinical_trial_tables.py:30-74): explode the per-compound
    * study lists, dedup trials by nct (deterministic first by nct
    * order), link compounds through the synonym table. Returns
    * (clinical_trial, compound_trial). */
  def buildClinicalTrialTables(studies: DataFrame,
      compoundSynonyms: DataFrame): (DataFrame, DataFrame) = {
    val flat = studies.select(
      col("nct"), col("link"), col("status"), col("compound_name"))
    val trials = Ids.denseId(
      flat.groupBy("nct").agg(min("link").as("link"), min("status").as("status")),
      Seq(col("nct")), idCol = "clinical_trial_id")
    val compoundTrial = flat.select("nct", "compound_name").dropDuplicates()
      .join(broadcast(trials.select("nct", "clinical_trial_id")), Seq("nct"))
      .join(broadcast(compoundSynonyms.select("compound_name", "compound_id").distinct()),
        Seq("compound_name"))
      .select("clinical_trial_id", "compound_id")
      .dropDuplicates()
    (trials.select("clinical_trial_id", "nct", "link", "status"), compoundTrial)
  }
}
