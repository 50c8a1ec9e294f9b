package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Raw text-lines corpus source/sink — one document per line, the line
  * IS the text. The format carries NO schema, ids, or metadata; it is
  * the ingestion face for plain `.txt` / one-doc-per-line corpora (and
  * the export face for tools that want exactly that). Documents must be
  * newline-free — a embedded newline silently splits a document into
  * two, which is a property of the FORMAT, not this reader (q73's
  * round-trip gate would catch any engine-side mangling).
  *
  * Scale shape: both directions are plain distributed text scans/writes
  * — splittable, schema-free, no parsing beyond line framing. */
object Text {

  /** Write `col` (a single string column name) as text-line shards. */
  def writeText(df: DataFrame, textCol: String, path: String): Unit =
    df.select(df(textCol)).write.mode("overwrite").text(path)

  /** Read text-line shards: one row per line, column `value`. */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
}
