package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.schema.Inference
import graft.schema.Inference._

/** Unit + property tests for the runtime type-inference lattice
  * (reference semantics: Frames ColumnUniverse.hs / ColumnTypeable.hs;
  * fixtures per FIXTURES.md). The lattice is 4 points, so the algebraic
  * laws are checked exhaustively; order-independence uses seeded shuffles. */
class InferenceSpec extends AnyFunSuite {

  test("cell typing reproduces the reference's parse quirks") {
    assert(cellType("5") == Some(TInt))
    assert(cellType("5.0") == Some(TInt)) // intish: trailing .0 strips
    assert(cellType("5.5") == Some(TDouble))
    assert(cellType("80,000") == Some(TDouble)) // comma-grouped double
    assert(cellType("1e3") == Some(TDouble))
    assert(cellType("true") == Some(TBool))
    assert(cellType("False") == Some(TBool))
    assert(cellType("abc") == Some(TText))
    assert(cellType("") == None) // missing
    assert(cellType("NA") == None) // missing
    assert(cellType("  NA  ") == None)
    assert(cellType("f") == Some(TText)) // mpg drv column must NOT be bool
  }

  test("lattice join: Bool < Int < Double < Text; bool never widens numerically") {
    assert(join(TInt, TDouble) == TDouble)
    assert(join(TDouble, TInt) == TDouble)
    assert(join(TBool, TInt) == TText)
    assert(join(TBool, TText) == TText)
    assert(join(TInt, TText) == TText)
  }

  val allTypes = Seq(TBool, TInt, TDouble, TText)

  test("join is commutative, associative, idempotent (exhaustive)") {
    for (a <- allTypes; b <- allTypes; c <- allTypes) {
      assert(join(a, b) == join(b, a))
      assert(join(join(a, b), c) == join(a, join(b, c)))
      assert(join(a, a) == a)
    }
  }

  test("inference result is independent of row order (seeded shuffles)") {
    val cells = Seq("1", "2.5", "true", "x", "", "NA", "5.0", "80,000")
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val rs = List.fill(12)(List.fill(2)(cells(rnd.nextInt(cells.size))))
      val a = inferFromRows(Seq("c1", "c2"), rs)
      val b = inferFromRows(Seq("c1", "c2"), rs.reverse)
      val c = inferFromRows(Seq("c1", "c2"), rnd.shuffle(rs))
      assert(a.map(_.colType) == b.map(_.colType))
      assert(a.map(_.colType) == c.map(_.colType))
    }
  }

  test("prestige.csv-shaped fixture infers the reference schema") {
    // FIXTURES.md: _c0: Text, education: Double, income: Int, women:
    // Double, prestige: Double, census: Int, type: Text
    val names = Seq("_c0", "education", "income", "women", "prestige", "census", "type")
    val rows = Seq(
      Seq("gov.administrators", "13.11", "12351", "11.16", "68.8", "1113", "prof"),
      Seq("general.managers", "12.26", "25879", "4.02", "69.1", "1130", "prof"),
      Seq("nurses", "12.46", "4614", "96.12", "64.7", "3152", "NA"))
    val cols = inferFromRows(names, rows)
    assert(cols.map(_.colType) ==
      Seq(TText, TDouble, TInt, TDouble, TDouble, TInt, TText))
    assert(cols(6).nullable) // saw NA
    val st = Inference.toStructType(cols)
    assert(st.fields.map(_.dataType).toSeq ==
      Seq(StringType, DoubleType, LongType, DoubleType, DoubleType, LongType, StringType))
  }

  test("categorical: <=8 distinct -> categories tracked; >8 -> plain Text") {
    val opts = Options(categoricalMaxCardinality = 8)
    val small = (1 to 5).map(i => Seq(i.toString, Seq("Jan", "Feb", "Mar", "Apr", "May")(i - 1)))
    val smallCols = inferFromRows(Seq("id", "month"), small, opts)
    assert(smallCols(1).categories == Some(Seq("Apr", "Feb", "Jan", "Mar", "May")))
    val large = (1 to 11).map(i => Seq(i.toString, s"month$i"))
    val largeCols = inferFromRows(Seq("id", "month"), large, opts)
    assert(largeCols(1).categories.isEmpty)
    assert(largeCols(1).colType == TText)
  }

  test("column-count mismatch is a hard error (embedded newlines)") {
    assertThrows[IllegalArgumentException] {
      inferFromRows(Seq("a", "b"), Seq(Seq("1", "2"), Seq("1")))
    }
  }

  test("all-missing column falls back to nullable Text") {
    val cols = inferFromRows(Seq("x"), Seq(Seq(""), Seq("NA")))
    assert(cols.head.colType == TText)
    assert(cols.head.nullable)
  }
}
