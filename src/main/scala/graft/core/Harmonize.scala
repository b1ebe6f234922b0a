package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema harmonization: project a frame onto a declared target
  * schema — subset to the declared columns, pad missing columns with
  * typed nulls, and coerce types.
  *
  * Reference semantics: `harmonize_df_columns`
  * (/root/reference/PharmacoDI/utilities.py:6-50) — subsets to the
  * declared columns (:25-28), pads missing ones with typed nulls
  * (:31-35) and coerces types, including the float -> nullable int ->
  * string path that renders whole floats without a decimal point
  * (:41-46, e.g. pubchem ids read as 5757.0 must become "5757").
  *
  * Spark-first: this is a pure projection (`select` of casts), so it
  * fuses into whole-stage codegen and costs nothing extra at 100 TB —
  * no custom Expression needed.
  */
object Harmonize {

  /** Cast `c` (of static type `from`) to `to` with the reference's
    * float->int->string rule for numeric-to-string coercion.
    */
  def coerce(c: Column, from: DataType, to: DataType): Column = (from, to) match {
    case (f, t) if f == t => c
    case (DoubleType | FloatType, StringType) =>
      // utilities.py:41-46: whole floats print as integers, not "5757.0".
      // The integer-render branch must stay inside Long range: under
      // Spark 4's ANSI defaults, casting a whole double like 1e20
      // through LongType throws at runtime; such values fall back to
      // the plain double rendering instead.
      when(c.isNull, lit(null).cast(StringType))
        .otherwise(
          when(c === floor(c) && abs(c) < lit(9.2e18),
            c.cast(LongType).cast(StringType))
            .otherwise(c.cast(StringType)))
    case _ => c.cast(to)
  }

  /** Project `df` onto `target`: declared order, typed-null padding for
    * missing columns, coercion for present ones.
    */
  def harmonize(df: DataFrame, target: StructType): DataFrame = {
    val present = df.schema.map(f => f.name -> f.dataType).toMap
    val cols: Seq[Column] = target.fields.toSeq.map { f =>
      present.get(f.name) match {
        case Some(dt) => coerce(col(f.name), dt, f.dataType).as(f.name)
        case None     => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols: _*)
  }

  /** Driver-side name-set difference (np.setdiff1d on columns —
    * build_meta_tables.py:62): declared columns absent from `df`.
    */
  def missingColumns(df: DataFrame, declared: Seq[String]): Seq[String] =
    declared.filterNot(df.columns.toSet)

  /** Drop columns whose values are all null
    * (build_cellosaurus.py:64 `dropna(axis=1, how='all')`).
    * Two-pass: one distributed aggregate to count non-nulls per column,
    * then a driver-side projection decision — a single job at any
    * scale, no collect of data rows.
    */
  def dropAllNullColumns(df: DataFrame): DataFrame = {
    val counts = df.select(df.columns.toSeq.map(c => count(col(c)).as(c)): _*)
      .head()
    val keep = df.columns.zipWithIndex.collect {
      case (c, i) if counts.getLong(i) > 0 => col(c)
    }
    df.select(keep.toSeq: _*)
  }
}
