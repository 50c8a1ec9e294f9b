package graft.schema

import graft.schema.Inference._
import org.apache.spark.sql.types._

/** Source-code generation of a typed row type from an inferred column
  * plan — the analogue of the reference's `tableTypes` Template Haskell
  * splice (`/root/reference/src/Frames/TH.hs:74-88,174-175`), which
  * generates a row type plus per-column lenses from a CSV file and is
  * golden-tested by `/root/reference/test/examples.toml` +
  * `test/PrettyTH.hs`.
  *
  * Scala has no TH, so the analogue is a two-step contract:
  *   1. [[tableTypes]] infers the column plan from a bounded file
  *     prefix (the same §1.4 lattice the readers use) and emits the
  *     SOURCE TEXT of a `final case class` + companion — the user
  *     pastes it into their project once, exactly like checking in the
  *     output of any code generator.
  *   2. [[graft.sources.Csv.readTableAs]] reads the file as
  *     `Dataset[T]` for that class: compile-time column safety
  *     (`ds.map(_.pay)`) instead of stringly `col("pay")` — the thing
  *     a reference user gets from `tableTypes` on every table.
  *
  * Generated shape per table (our golden format, pinned in
  * CodegenSpec against the reference's own managers/employees/prestige
  * fixtures):
  *   - `final case class <Name>(field: Type, ...)` — field i maps to
  *     CSV column i; inferred-nullable columns become `Option[...]`.
  *   - companion `columnNames` — the raw CSV header names in file
  *     order (field names are SANITIZED, so the raw names must ride
  *     along for the positional read mapping).
  *   - companion `cols.<field>` typed accessors — the per-column-lens
  *     analogue, addressing the `Dataset[T]`'s renamed columns.
  *   - categorical columns stay `String` and carry their level set in
  *     a comment (the reference generates a variant ADT per
  *     categorical column; a comment + the Categorical operator's
  *     metadata encode the same contract without a macro).
  */
object Codegen {

  /** Scala keywords that cannot be bare identifiers — generated field
    * names matching one are backtick-quoted, the Scala counterpart of
    * the reference renaming reserved type names (`Utils.hs:18-28`). */
  private val scalaKeywords = Set(
    "abstract", "case", "catch", "class", "def", "do", "else", "extends",
    "false", "final", "finally", "for", "forSome", "if", "implicit",
    "import", "lazy", "match", "new", "null", "object", "override",
    "package", "private", "protected", "return", "sealed", "super",
    "this", "throw", "trait", "true", "try", "type", "val", "var",
    "while", "with", "yield")

  /** Massage a CSV column name into a valid Scala TYPE identifier —
    * the reference's `sanitizeTypeName` (`src/Frames/Utils.hs:18-28`):
    * split on non-alphanumerics, capitalize each fragment's head,
    * concatenate; prefix `Col` when the result is empty or starts with
    * a non-letter. */
  def sanitizeTypeName(raw: String): String = {
    val joined = raw
      .split("[^A-Za-z0-9]+")
      .filter(_.nonEmpty)
      .map(s => s.head.toUpper.toString + s.tail)
      .mkString
    if (joined.isEmpty || !joined.head.isLetter) "Col" + joined else joined
  }

  /** Field name: the type name with a lowered head (`TH.hs:69-71`),
    * backtick-quoted if it lands on a Scala keyword. */
  def fieldName(raw: String): String = {
    val t = sanitizeTypeName(raw)
    val f = t.head.toLower.toString + t.tail
    if (scalaKeywords(f)) s"`$f`" else f
  }

  /** The Scala type rendered for a column: lattice type (Int is `Long`
    * for the same 100 TB-safety reason the runtime schema uses
    * LongType, SURVEY §1.2), custom cell types via their Spark
    * DataType's external Scala type, inferred-nullable as Option. */
  def scalaTypeOf(ci: ColInfo): String = {
    val base = ci.colType match {
      case TBool => "Boolean"
      case TInt => "Long"
      case TDouble => "Double"
      case TText => "String"
      case TCustom(_) => ci.custom.map(_.dataType) match {
        case Some(TimestampType) => "java.sql.Timestamp"
        case Some(DateType) => "java.sql.Date"
        case Some(StringType) | None => "String"
        case Some(other) =>
          sys.error(s"no Scala rendering for custom cell type $other on ${ci.name}")
      }
    }
    if (ci.nullable) s"Option[$base]" else base
  }

  /** Render the generated source for one table. Field names are
    * deduplicated after sanitization (two headers that sanitize to the
    * same identifier get positional suffixes — the collision TH would
    * reject at splice time). */
  def caseClassSource(className: String, cols: Seq[ColInfo]): String = {
    require(cols.nonEmpty, "cannot generate a row type for zero columns")
    val cls = sanitizeTypeName(className)
    val rawFields = cols.map(ci => fieldName(ci.name))
    val fields = rawFields.zipWithIndex.map { case (f, i) =>
      if (rawFields.count(_ == f) == 1) f else s"${f}_${i + 1}"
    }
    def catComment(ci: ColInfo): String = ci.categories match {
      case Some(cats) =>
        s" // categorical: ${cats.sorted.mkString(", ")}"
      case None => ""
    }
    val fieldLines = cols.zip(fields).zipWithIndex.map { case ((ci, f), i) =>
      val comma = if (i == cols.size - 1) "" else ","
      s"  $f: ${scalaTypeOf(ci)}$comma${catComment(ci)}"
    }
    val nameLits = cols.map(ci => "\"" + ci.name + "\"").mkString(", ")
    val accessors = fields.map(f => s"    val $f: Column = col(${quoteLit(f)})")
    s"""// Generated by graft.schema.Codegen (tableTypes analogue).
       |// Read with: graft.sources.Csv.readTableAs[$cls](spark, path)
       |final case class $cls(
       |${fieldLines.mkString("\n")}
       |)
       |
       |object $cls {
       |  /** Raw CSV column names in file order (field i <-> column i). */
       |  val columnNames: Seq[String] = Seq($nameLits)
       |
       |  /** Typed per-column accessors over the Dataset[$cls] columns —
       |    * the reference's per-column lenses (Frames TH.hs:74-88). */
       |  object cols {
       |    import org.apache.spark.sql.Column
       |    import org.apache.spark.sql.functions.col
       |${accessors.mkString("\n")}
       |  }
       |}
       |""".stripMargin
  }

  private def quoteLit(f: String): String =
    "\"" + f.stripPrefix("`").stripSuffix("`") + "\""

  /** The `tableTypes` entry point: infer the column plan from the file
    * (bounded prefix, same options as the readers) and emit the row
    * type's source text. */
  def tableTypes(
      className: String,
      path: String,
      opts: graft.sources.Csv.ParserOptions = graft.sources.Csv.ParserOptions())
      : String =
    caseClassSource(className, graft.sources.Csv.inferSchema(path, opts))
}
