package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical (bounded-cardinality text) columns, end-to-end: the
  * reference code-generates a Haskell sum type per categorical column and
  * stores codes (acowley/Frames `src/Frames/Categorical.hs:66-139`); the
  * Spark-native equivalent keeps the column as a string plus a
  * `graft.categories` metadata array (attached by schema inference /
  * the CSV reader when <= n distinct values are observed,
  * `src/Frames/Categorical.hs:130-139` fallback semantics), with
  * encode/decode helpers to move between label and dense code.
  *
  * Codes are positions in the SORTED category list — deterministic at any
  * scale and stable across partitionings. Everything is a literal-array
  * expression (codegen'd, no shuffle, no UDF); at 100 TB the dictionary
  * rides along as a broadcast-sized literal because cardinality is
  * bounded by construction.
  */
object Categorical {

  /** The category dictionary recorded by inference, if any. */
  def categoriesOf(df: DataFrame, colName: String): Option[Seq[String]] = {
    val md = df.schema(colName).metadata
    if (md.contains("graft.categories")) Some(md.getStringArray("graft.categories").toSeq)
    else None
  }

  /** Label -> 0-based dense code (null for null / out-of-dictionary —
    * the runtime analogue of the reference's parse failure on an unknown
    * variant). */
  def encodeExpr(c: Column, categories: Seq[String]): Column = {
    val dict = array(categories.map(lit): _*)
    val pos = array_position(dict, c)
    when(pos === 0, lit(null)).otherwise((pos - 1).cast("int"))
  }

  /** 0-based code -> label (null when null or out of range; the range
    * guard matters under ANSI mode, where a bare element_at on a stray
    * code would error instead). */
  def decodeExpr(code: Column, categories: Seq[String]): Column = {
    val c = code.cast("int")
    when(
      c.isNotNull && c >= 0 && c < categories.size,
      element_at(array(categories.map(lit): _*), c + 1))
  }

  /** Append `<col>_code` using the dictionary recorded in the column's
    * metadata. Fails fast if the column was not inferred categorical. */
  def encode(df: DataFrame, colName: String, codeCol: String = ""): DataFrame = {
    val cats = categoriesOf(df, colName).getOrElse(
      sys.error(s"column $colName has no graft.categories metadata"))
    val out = if (codeCol.isEmpty) s"${colName}_code" else codeCol
    df.withColumn(out, encodeExpr(col(colName), cats))
  }
}
