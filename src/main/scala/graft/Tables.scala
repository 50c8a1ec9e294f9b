package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lazy accessors for the driver-generated parquet test tables
  * (TESTDATA.md). Each accessor is a fresh lazy scan — Catalyst prunes
  * columns and pushes filters into the parquet reader per-query. */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")

  /** The events parquet's `ts` physical type has varied across driver
    * testdata generations — TIMESTAMP(NANOS) (which Spark reads as a
    * nanosecond long only under the `nanosAsLong` legacy flag) and
    * TIMESTAMP(MICROS) without timezone (read natively as
    * TIMESTAMP_NTZ). This accessor adapts to whichever the files carry
    * and always yields a session-timezone `timestamp` column (UTC in
    * every entrypoint), so downstream windows/as-of joins see one type.
    *
    * DELIBERATE side effect: flips the session-wide `nanosAsLong`
    * legacy flag BEFORE the read — there is no per-read option for it,
    * schema inference itself throws on nanos files without it, and the
    * driver invokes queries on its own session, so the accessor must be
    * self-sufficient. The flag only changes behavior for other
    * TIMESTAMP(NANOS) reads, which this engine always wants as longs. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanos-as-long: truncate to micros (floor for post-epoch values)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000").cast("long")))
      case _ =>
        // TIMESTAMP_NTZ (or already timestamp): UTC session makes this
        // cast micros-identical
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
