package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `zorder(bits)(c1..cN) -> long`: Morton/Z-order bit interleave of N
  * pre-binned non-negative values — bit `i` of column `j` lands at output
  * position `i*N + j`. Sorting by the result clusters rows that are close
  * in EVERY dimension, which is what makes multi-column min/max data
  * skipping work: a range-partitioned write ordered by z-value gives each
  * file a tight bounding box in all N dimensions, so a conjunctive range
  * predicate prunes files/row-groups on every column, not just the
  * leading sort key (the Delta/Iceberg OPTIMIZE ZORDER technique, from
  * Morton 1966). See [[graft.operators.Layout.zorderLayout]] for the
  * binning + repartition composition.
  *
  * Inputs MUST already be bins in [0, 2^bits): the expression masks to
  * `bits` low bits (values outside the range alias rather than error —
  * binning is the caller's contract). N*bits must fit a signed long
  * (<= 63). Null in any input -> null out (codegen'd, branch-free body).
  */
case class ZOrderN(children: Seq[Expression], bits: Int)
    extends Expression with ImplicitCastInputTypes {
  require(children.size >= 2, "zorder needs at least 2 columns")
  require(bits >= 1 && children.size * bits <= 63,
    s"bits=$bits x ${children.size} cols must fit a signed long")

  override def inputTypes = Seq.fill(children.size)(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val n = children.size
    var z = 0L
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Long] & ((1L << bits) - 1)
      var i = 0
      while (i < bits) {
        z |= ((x >>> i) & 1L) << (i * n + j)
        i += 1
      }
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.size
    val evals = children.map(_.genCode(ctx))
    val z = ctx.freshName("z")
    val x = ctx.freshName("x")
    val i = ctx.freshName("i")
    val mask = (1L << bits) - 1
    val perChild = evals.zipWithIndex.map { case (c, j) =>
      val body =
        s"""long $x = ${c.value} & ${mask}L;
           |for (int $i = 0; $i < $bits; $i++) {
           |  $z |= (($x >>> $i) & 1L) << ($i * $n + $j);
           |}""".stripMargin
      // only nullable children get a null check (a non-nullable child's
      // isNull is the literal `false`, not an assignable variable)
      val guarded =
        if (children(j).nullable)
          s"if (${c.isNull}) { ${ev.isNull} = true; } else {\n$body\n}"
        else s"{\n$body\n}" // braces: $x/$i redeclare per child block
      s"${c.code}\n$guarded"
    }.mkString("\n")
    val nullInit = if (nullable) s"boolean ${ev.isNull} = false;" else ""
    ev.copy(code = code"""
      |$nullInit
      |long $z = 0L;
      |$perChild
      |long ${ev.value} = $z;
      """.stripMargin,
      isNull = if (nullable) ev.isNull else FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderN =
    copy(children = newChildren)

  override def prettyName: String = "zorder"
}

object ZOrderN {
  def apply(bits: Int)(cols: Column*): Column =
    ColumnBridge.column(
      ZOrderN(cols.map(ColumnBridge.expression), bits))
}
