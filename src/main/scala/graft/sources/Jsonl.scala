package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-Lines corpus I/O — the interchange format web-scale text
  * corpora actually arrive in (one JSON object per line). The read
  * modes mirror the CSV front door's trio ([[Csv]], which mirrors the
  * reference acowley/Frames `src/Frames/CSV.hs:281-429`): strict,
  * per-cell nullable, and debug-with-corrupt-side-channel.
  *
  * Scale design: JSONL is newline-delimited, so Spark's distributed
  * text source splits files at line boundaries — reads parallelize by
  * HDFS block regardless of file count or size. All three readers take
  * an EXPLICIT schema: Spark's JSON schema inference is a full extra
  * pass over the data (sampling only reduces the parsed fraction), so
  * at 100 TB the schema comes from a catalog or [[inferJsonl]] over a
  * bounded sample, never from the read path itself. Writes shard one
  * file per task — the natural layout for downstream re-reads.
  */
object Jsonl {

  /** Write `df` as JSON-Lines, one shard per partition. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Strict read: a row survives iff its line parses as a JSON object
    * conforming to `schema` (the readTable analogue — bad rows are
    * silently dropped). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)

  /** Per-cell nullable read: a malformed line or mistyped field yields
    * nulls, the row survives (the readTableMaybe analogue). */
  def readJsonlMaybe(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** Debug read (the readTableDebug analogue): (clean rows, corrupt
    * side channel carrying the raw offending line in `corruptCol`).
    *
    * Formulated as a TEXT scan + `from_json`, not the JSON source's
    * internal corrupt-record column: Spark rejects any plan whose only
    * referenced scan column is that internal column (so e.g.
    * `corrupt.count()` would throw), while `from_json` is an ordinary
    * expression — both channels prune and compose like any other frame,
    * and the scan stays line-splittable. */
  def readJsonlDebug(
      spark: SparkSession,
      path: String,
      schema: StructType,
      corruptCol: String = "_corrupt_record"): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+
      StructField(corruptCol, StringType, nullable = true))
    val parsed = spark.read.text(path).select(
      col("value"),
      from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)).as("__r"))
    // A literal `null` line parses to a null struct (no corrupt-record
    // entry), so test the struct itself too — otherwise such lines
    // fail BOTH filters and silently vanish from both channels.
    val bad = col(s"__r.$corruptCol").isNotNull || col("__r").isNull
    (parsed.filter(!bad).select(schema.fieldNames.map(f => col(s"__r.$f")): _*),
      parsed.filter(bad).select(col("value").as(corruptCol)))
  }

  /** Bounded schema inference: Spark's JSON inference over a sampled
    * fraction of lines. Use once, persist the schema, then read with
    * the explicit-schema paths above — inference is an extra pass and
    * must never sit inside a production 100 TB read. */
  def inferJsonl(spark: SparkSession, path: String, samplingRatio: Double = 0.01): StructType =
    spark.read.option("samplingRatio", samplingRatio).json(path).schema
}
