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

  /** The events parquet stores TIMESTAMP(NANOS), which Spark's reader
    * rejects by default. Reads nanos as long and converts to a
    * microsecond timestamp (`div` truncation == floor for these
    * post-epoch timestamps; sub-microsecond precision is below any
    * window/bucket granularity the engine exposes).
    *
    * DELIBERATE side effect: flips the session-wide
    * `nanosAsLong` legacy flag — there is no per-read option for it, and
    * the driver invokes queries on its own session, so the accessor must
    * be self-sufficient. The flag only changes behavior for other
    * TIMESTAMP(NANOS) reads, which this engine always wants read as
    * longs. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn(
      "ts", timestamp_micros(expr("ts div 1000").cast("long")))
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
