package graft.pset

import graft.core.Ids
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Synonym tables from wide curation metadata
  * (/root/reference/PharmacoDI/build_synonym_tables.py:34-205):
  * select the per-dataset id columns by regex, melt to long, join the
  * consolidated entity table on the curated unique id, normalize
  * dataset names with the reference's regex chain, map dataset name ->
  * surrogate id via the (broadcast) dataset dimension, dedup, dense id.
  *
  * One generic builder covers cell/tissue/compound — the reference's
  * three near-copies collapse into parameters.
  */
object SynonymBuilders {

  /** Dataset-name normalization chain
    * (build_synonym_tables.py:77-81 and copies): strip the column
    * suffix, then GDSC-version rules. */
  def normalizeDatasetName(c: org.apache.spark.sql.Column, idSuffix: String) = {
    val stripped = regexp_replace(c, s"\\.$idSuffix$$|[_.].*$$", "")
    val gdscV2 = regexp_replace(stripped, "GDSC$", "GDSC_v2")
    regexp_replace(gdscV2, "GDSC1.*$", "GDSC_v1")
  }

  /** Generic melt-and-join synonym builder.
    *
    * @param meta       wide curation table (one `unique.{x}id` column +
    *                   one `{Dataset}.{x}id` column per dataset)
    * @param entity     consolidated entity table (id, name, ...)
    * @param datasetDf  consolidated dataset table (id, name)
    * @param idSuffix   "cellid" | "tissueid" | "drugid"
    * @param entityIdCol output FK column name (e.g. "cell_id")
    * @param nameCol    output synonym column name (e.g. "cell_name")
    * @param validDatasets dataset-name whitelist (the reference derives
    *                   it from the procdata listing —
    *                   build_synonym_tables.py:50-56)
    */
  def build(meta: DataFrame, entity: DataFrame, datasetDf: DataFrame,
      idSuffix: String, entityIdCol: String, nameCol: String,
      validDatasets: Seq[String]): DataFrame = {
    val uniqueCol = s"unique.$idSuffix"
    val synCols = meta.columns.filter(c =>
      c.matches(s".*$idSuffix$$") && c != uniqueCol &&
        validDatasets.exists(d => c.startsWith(d)))
    require(synCols.nonEmpty, s"no synonym columns matching *$idSuffix")
    val long = meta.select((col(s"`$uniqueCol`").as("unique_id") +:
        synCols.toSeq.map(c => col(s"`$c`").cast(StringType).as(c))): _*)
      .unpivot(Array(col("unique_id")), "dataset_name", nameCol)
      .filter(col(nameCol).isNotNull)
      .dropDuplicates()
    val joined = entity.select(col("id").as(entityIdCol), col("name"))
      .join(long, col("name") === col("unique_id"), "left")
      .drop("name", "unique_id")
      .filter(col(nameCol) =!= "")
      .dropDuplicates()
    val mapped = joined
      .withColumn("dataset_name", normalizeDatasetName(col("dataset_name"), idSuffix))
      .join(broadcast(datasetDf.select(col("id").as("dataset_id"),
        col("name").as("dataset_name"))), Seq("dataset_name"))
      .select(col(entityIdCol), col("dataset_id"), col(nameCol))
      .dropDuplicates()
      .na.drop()
    Ids.denseId(mapped, Seq(col(entityIdCol), col("dataset_id"), col(nameCol)))
  }

  def buildCellSynonyms(meta: DataFrame, cell: DataFrame, dataset: DataFrame,
      validDatasets: Seq[String]): DataFrame =
    build(meta, cell, dataset, "cellid", "cell_id", "cell_name", validDatasets)

  def buildTissueSynonyms(meta: DataFrame, tissue: DataFrame, dataset: DataFrame,
      validDatasets: Seq[String]): DataFrame =
    build(meta, tissue, dataset, "tissueid", "tissue_id", "tissue_name", validDatasets)

  def buildCompoundSynonyms(meta: DataFrame, compound: DataFrame, dataset: DataFrame,
      validDatasets: Seq[String]): DataFrame =
    build(meta, compound, dataset, "drugid", "compound_id", "compound_name", validDatasets)
}
