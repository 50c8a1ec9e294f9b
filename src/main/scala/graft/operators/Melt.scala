package graft.operators

import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide-to-long reshape, mirroring the reference's `melt`
  * (acowley/Frames `src/Frames/Melt.hs:104-114`): keep the id columns,
  * stack every remaining column into `(variable, value)` — one output row
  * per (input row x value column).
  *
  * The reference stores the stacked value as a `CoRec` (type-tagged sum);
  * relationally the value column must take the least upper bound of the
  * melted column types (numeric -> double, otherwise string), which is the
  * same lattice used by schema inference (SURVEY §1.4).
  *
  * Implementation is the `stack` generator expression — a codegen'd,
  * narrow (no-shuffle) transform that scales linearly; plus the inverse
  * `pivot` (absent in the reference, free in Spark).
  */
object Melt {

  /** LUB of melted column types: all-numeric -> DoubleType, else String. */
  def valueType(df: DataFrame, valueCols: Seq[String]): DataType = {
    val types = valueCols.map(c => df.schema(c).dataType)
    val numeric = types.forall {
      case _: NumericType | BooleanType => true
      case _ => false
    }
    if (numeric) DoubleType else StringType
  }

  def melt(
      df: DataFrame,
      idCols: Seq[String],
      valueColsIn: Seq[String] = Nil,
      varName: String = "variable",
      valName: String = "value"): DataFrame = {
    val valueCols =
      if (valueColsIn.nonEmpty) valueColsIn
      else df.columns.filterNot(idCols.contains).toSeq
    require(valueCols.nonEmpty, "melt: no value columns")
    val vt = valueType(df, valueCols).sql
    // backtick-quote identifiers with doubled-backtick escape; single-quote
    // string literals with both quote and backslash escaped — arbitrary
    // column names (including ` and ') survive the generated stack expr
    def ident(c: String) = "`" + c.replace("`", "``") + "`"
    def strLit(c: String) =
      "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val pairs = valueCols
      .map(c => s"${strLit(c)}, cast(${ident(c)} as $vt)")
      .mkString(", ")
    val stackExpr =
      expr(s"stack(${valueCols.size}, $pairs) as (${ident(varName)}, ${ident(valName)})")
    df.select(idCols.map(col) :+ stackExpr: _*)
  }

  /** Long-to-wide inverse (not in the reference; Spark-native extra).
    * `pivotValues` must be pinned for a scale-safe single-pass plan —
    * leaving it empty costs an extra distinct-collect pass. */
  def pivot(
      df: DataFrame,
      idCols: Seq[String],
      varCol: String,
      valCol: String,
      pivotValues: Seq[String],
      agg: Column => Column = first(_)): DataFrame = {
    val g = df.groupBy(idCols.map(col): _*)
    val p =
      if (pivotValues.nonEmpty) g.pivot(varCol, pivotValues) else g.pivot(varCol)
    p.agg(agg(col(valCol)))
  }
}
