package graft.pset

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single entry point for the full PharmacoDI workload — the Spark
  * analog of running the reference's build_all_pset_tables +
  * combine_all_pset_tables + synonym/meta/cellosaurus builders
  * (/root/reference/PharmacoDI/build_all_pset_tables.py:30-78,
  * combine_pset_tables.py:27-47). A user of the reference points this
  * at the same inputs and gets the same ~25 tables as parquet.
  *
  * @param rawDir       directory containing `{name}_PSet` export dirs
  * @param workDir      per-PSet intermediate tables (parquet)
  * @param finalDir     consolidated output tables (parquet)
  * @param compoundMeta curated (name, compound_uid) metadata
  *                     (drugs_with_ids — combine_pset_tables.py:73-81)
  */
final case class PipelineConfig(
    rawDir: String,
    workDir: String,
    finalDir: String,
    psetNames: Seq[String],
    cellosaurusPath: Option[String] = None,
    cellSynonymMeta: Option[DataFrame] = None,
    tissueSynonymMeta: Option[DataFrame] = None,
    compoundSynonymMeta: Option[DataFrame] = None)

object Pipeline {

  /** Phase 1+2: per-PSet builds (parallelizable per PSet — each is an
    * independent Spark job DAG) then cross-PSet consolidation. Returns
    * the consolidated tables; synonym/cellosaurus phases run when
    * their inputs are configured. */
  def run(spark: SparkSession, cfg: PipelineConfig, compoundMeta: DataFrame,
      audit: (String, DataFrame) => Unit = (_, _) => ()): Map[String, DataFrame] = {

    // Phase 1: per-PSet table builds (E1)
    cfg.psetNames.foreach { name =>
      val pset = PSetReader.read(spark, cfg.rawDir, name)
      PSetBuilders.writeAll(PSetBuilders.buildAll(spark, pset), name, cfg.workDir)
    }

    // Phase 2: cross-PSet consolidation (E2)
    var tables = Consolidator.combineAll(spark, cfg.workDir, cfg.finalDir,
      compoundMeta, audit)

    // Phase 3: synonyms (E3) — driven by configured curation metadata
    def writeFinal(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"${cfg.finalDir}/$name.parquet")
      tables += name -> spark.read.parquet(s"${cfg.finalDir}/$name.parquet")
    }
    cfg.cellSynonymMeta.foreach { meta =>
      writeFinal("cell_synonym", SynonymBuilders.buildCellSynonyms(
        meta, tables("cell"), tables("dataset"), cfg.psetNames))
    }
    cfg.tissueSynonymMeta.foreach { meta =>
      writeFinal("tissue_synonym", SynonymBuilders.buildTissueSynonyms(
        meta, tables("tissue"), tables("dataset"), cfg.psetNames))
    }
    cfg.compoundSynonymMeta.foreach { meta =>
      writeFinal("compound_synonym", SynonymBuilders.buildCompoundSynonyms(
        meta, tables("compound"), tables("dataset"), cfg.psetNames))
    }

    // Phase 4: Cellosaurus enrichment
    cfg.cellosaurusPath.foreach { path =>
      writeFinal("cellosaurus", Cellosaurus.build(spark, path, tables("cell")))
    }

    tables
  }
}
