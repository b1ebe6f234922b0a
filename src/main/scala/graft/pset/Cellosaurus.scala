package graft.pset

import graft.core.{Harmonize, Ids}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cellosaurus flat-file parser
  * (/root/reference/PharmacoDI/build_cellosaurus.py:34-92): skip the
  * 55-line header, split records on `//` lines, split `CODE   value`
  * fields on three spaces, aggregate repeated codes per record with
  * `'|||'` join, pivot codes to columns, join to the cell dimension.
  *
  * Spark shape: `spark.read.text` + a running record id. Record
  * boundaries are line-order-dependent, and a plain text scan does not
  * guarantee global line order across splits — so the record-id pass
  * reads the single file in one task (the file is ~100 MB in
  * production, far below a task's capacity; SURVEY §7.4.4), after
  * which the groupBy/pivot/join pipeline is fully distributed.
  */
object Cellosaurus {

  val Codes: Seq[String] = Seq("as", "sy", "dr", "rx", "ww", "cc",
    "st", "di", "ox", "hi", "oi", "sx", "ca")

  /** Parse the flat file into one row per (record, code) with
    * '|||'-joined values, then pivot to one row per record. */
  def parse(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
      .coalesce(1) // keep file line order for record-boundary detection
      .rdd.zipWithIndex()
      .map { case (l, i) => (i, l) }
      .toDF("line_no", "line")
      .filter(col("line_no") >= 55)
    // running record id = count of '//' separators before this line
    val withRec = lines
      .withColumn("is_sep", when(col("line") === "//", 1).otherwise(0))
      .withColumn("rec",
        sum(col("is_sep")).over(
          org.apache.spark.sql.expressions.Window.orderBy("line_no"))
          - col("is_sep"))
      .filter(col("is_sep") === 0)
    val kv = withRec
      .withColumn("parts", split(col("line"), "   ", 2))
      .filter(size(col("parts")) > 1)
      .select(col("rec"), col("line_no"),
        col("parts").getItem(0).as("code"),
        col("parts").getItem(1).as("value"))
    // '|||'-join repeated codes in line order (build_cellosaurus.py:26-30)
    val grouped = kv.groupBy("rec", "code")
      .agg(concat_ws("|||",
        transform(array_sort(collect_list(struct(col("line_no"), col("value")))),
          s => s.getField("value"))).as("value"))
    // pivot codes to columns, lower-cased; ID -> identifier, AC -> accession.
    // Pivot values are DECLARED: the code set is closed (the reference's
    // final projection build_cellosaurus.py:88-89 keeps exactly ID/AC +
    // Codes; AG/DT are parsed then dropped per build_cellosaurus.py:70),
    // so passing them skips the hidden distinct-values collect job an
    // undeclared pivot runs first — same rule r7Pivot documents.
    val pivotCodes = Seq("ID", "AC", "AG", "DT") ++ Codes.map(_.toUpperCase)
    val pivoted = grouped.groupBy("rec")
      .pivot("code", pivotCodes)
      .agg(first("value"))
    val renames = pivoted.columns.map {
      case "ID" => "identifier"
      case "AC" => "accession"
      case c => c.toLowerCase
    }
    val lowered = pivoted.toDF(renames.toSeq: _*)
      .drop("ag", "dt") // age-of-donor, date (build_cellosaurus.py:70)
    Harmonize.dropAllNullColumns(lowered).drop("rec")
  }

  /** Join parsed records to the consolidated cell table and emit the
    * cellosaurus schema (build_cellosaurus.py:76-90): identifier =
    * cell natural name, cell_id = surrogate id; inner-matched rows
    * only (`id >= 1` filter). */
  def build(spark: SparkSession, path: String, cellDf: DataFrame): DataFrame = {
    val parsed = parse(spark, path)
    val joined = cellDf.select(col("id").as("cell_id"), col("name"))
      .join(parsed.withColumnRenamed("identifier", "name"), Seq("name"), "inner")
    val cols = Seq("name", "cell_id") ++ Codes.filter(joined.columns.contains)
    val projected = joined.select(cols.head, cols.tail: _*)
      .withColumnRenamed("name", "identifier")
    Ids.denseId(projected, Seq(col("cell_id")))
  }
}
