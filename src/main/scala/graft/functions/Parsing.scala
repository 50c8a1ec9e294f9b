package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level parse expressions reproducing the reference's cell-parse
  * semantics (acowley/Frames `src/Frames/ColumnTypeable.hs`):
  *
  *   - "intish" integer parse: a trailing `".0"` is stripped, so `"5.0"`
  *     parses as integer 5 (ColumnTypeable.hs:61-74, `parseIntish`);
  *   - lenient double parse: grouping commas are removed, so `"80,000"`
  *     parses as 80000.0 (ColumnTypeable.hs:77-80);
  *   - `""` and `"NA"` are missing values (ColumnUniverse.hs:196).
  *
  * Everything here is a composition of built-in codegen'd expressions
  * (`regexp_replace`, `cast`, `when`) — no UDFs — so predicates built on
  * top of these still participate in whole-stage codegen and, where the
  * source supports it, pushdown.
  */
object Parsing {

  /** Regexes mirroring the reference's Parseable instances. */
  val IntishRe = "^[+-]?\\d+(\\.0)?$"
  val DoubleRe = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"
  val BoolRe = "^(?i)(true|false)$"

  // NOTE: there is deliberately no naToNull helper: missing-marker
  // handling lives in the parse regexes ("" / "NA" fail every non-Text
  // parse) and Text columns keep the literal "NA", matching the
  // reference's Text Parseable (a marker-nulling pass on Text would
  // diverge from it).

  /** Intish parse: `"5"` and `"5.0"` -> 5L; anything else -> null.
    * Native single-pass kernel ([[expressions.ParseIntish]]) — a W-column
    * read runs one parse per cell, and the regex formulation's ~1µs/cell
    * was the dominant cost of the whole CSV read path. */
  def parseIntish(c: Column): Column = expressions.ParseOps.parseIntish(c)

  /** Lenient double: strips grouping commas (`"80,000"` -> 80000.0). */
  def parseDouble(c: Column): Column = expressions.ParseOps.parseLenientDouble(c)

  /** Bool parse (`true`/`false`, case-insensitive like Haskell's Read
    * accepts `True`/`False`; we accept both casings). */
  def parseBool(c: Column): Column = expressions.ParseOps.parseBool(c)

  /** Timestamp parse for the reference's TimeZones demo formats
    * (`%F %T` and `%F`, TimeIn.hs:28-31). */
  def parseTimestamp(c: Column): Column =
    coalesce(
      try_to_timestamp(trim(c), lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(trim(c), lit("yyyy-MM-dd")))
}
