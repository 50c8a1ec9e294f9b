package graft

import org.apache.spark.sql.functions._
import graft.queries.OracleSql

/** Cross-engine validation of the DuckDB XXH64 emulation that powers the
  * exact LSH/sketch oracles: the generated SQL must reproduce Spark's
  * `xxhash64` bit-for-bit for every input-length class of the algorithm
  * (empty, tail-1/4/8 combinations, >=32-byte stripes, multi-stripe) and
  * for the 8-byte long path. Requires local python3+duckdb (present in
  * this container — same interpreter the oracle gate uses); cancels, not
  * fails, when unavailable.
  */
class OracleXxhSpec extends SparkSpec {

  import spark.implicits._

  private def duckdb(sql: String): Vector[String] = {
    import scala.sys.process._
    val py =
      """import sys, duckdb
        |con = duckdb.connect()
        |for row in con.sql(sys.stdin.read()).fetchall():
        |    print(row[0])
        |""".stripMargin
    val in = new java.io.ByteArrayInputStream(sql.getBytes("UTF-8"))
    val out = new StringBuilder
    val err = new StringBuilder
    val code = (Seq("python3", "-c", py) #< in) ! ProcessLogger(out.append(_).append('\n'), err.append(_).append('\n'))
    assert(code == 0, s"duckdb failed: $err\nSQL was:\n${sql.take(2000)}")
    out.toString.linesIterator.toVector
  }

  private lazy val duckdbAvailable: Boolean = {
    import scala.sys.process._
    (Seq("python3", "-c", "import duckdb") ! ProcessLogger(_ => ())) == 0
  }

  // deterministic ASCII strings covering every tail/stripe combination
  private val strings: Seq[String] = {
    def gen(len: Int, salt: Int): String = {
      val cs = new Array[Char](len)
      var x = salt * 2654435761L + 1
      var i = 0
      while (i < len) {
        x = x * 6364136223846793005L + 1442695040888963407L
        cs(i) = (32 + math.floorMod(x >>> 33, 95)).toChar // printable ASCII
        i += 1
      }
      new String(cs)
    }
    val lens = Seq(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 12, 15, 16, 17, 23, 24,
      31, 32, 33, 39, 40, 43, 47, 48, 63, 64, 65, 71, 96, 100, 127, 128, 200)
    lens.zipWithIndex.map { case (l, i) => gen(l, i) } ++
      Seq("hello world", "the quick brown fox", "a,b|c d")
  }

  private val longs: Seq[Long] = Seq(0L, 1L, -1L, 42L, 255L, 256L,
    Long.MaxValue, Long.MinValue, 6364136223846793005L, -98765432123456789L)

  test("DuckDB emulation matches Spark xxhash64 on strings (all length classes)") {
    assume(duckdbAvailable, "python3+duckdb not available")
    val expected = strings.toDF("s").select(xxhash64(col("s"))).as[Long].collect()
    val values = strings.map(s => "('" + s.replace("'", "''") + "')").mkString(",")
    val sql =
      s"""WITH t(s) AS (VALUES $values)
         |SELECT ${OracleSql.u2s(OracleSql.xxh64Ascii("s"))} AS h FROM t""".stripMargin
    val got = duckdb(sql).map(_.toLong)
    assert(got.size == expected.length)
    strings.indices.foreach { i =>
      assert(got(i) == expected(i), s"len=${strings(i).length} str=${strings(i).take(40)}")
    }
  }

  test("DuckDB emulation matches Spark xxhash64 on longs (8-byte path)") {
    assume(duckdbAvailable, "python3+duckdb not available")
    val expected = longs.toDF("v").select(xxhash64(col("v"))).as[Long].collect()
    // Long.MinValue cannot be written as a literal (the positive half
    // overflows before negation) — render it as an expression.
    def longLit(v: Long): String =
      if (v == Long.MinValue) "(-9223372036854775807 - 1)::BIGINT" else s"${v}::BIGINT"
    val values = longs.map(v => s"(${longLit(v)})").mkString(",")
    val sql =
      s"""WITH t(v) AS (VALUES $values)
         |SELECT ${OracleSql.u2s(OracleSql.xxh64Long(OracleSql.s2u("v")))} AS h FROM t""".stripMargin
    val got = duckdb(sql).map(_.toLong)
    longs.indices.foreach { i =>
      assert(got(i) == expected(i), s"long=${longs(i)}")
    }
  }

  test("seeded long path matches the xxhash64(seed-chained) composition") {
    assume(duckdbAvailable, "python3+duckdb not available")
    // Spark's multi-arg xxhash64 chains: hash(b, hash(a, 42)) — the exact
    // shape minhash uses: hashLong(base, hashLong(seed+i, 42)).
    val pairs = Seq((0L, 1L), (42L, 7L), (-3L, Long.MaxValue), (123456789L, -987654321L))
    val expected = pairs.toDF("a", "b").select(xxhash64(col("a"), col("b"))).as[Long].collect()
    val values = pairs.map { case (a, b) => s"(${a}::BIGINT, ${b}::BIGINT)" }.mkString(",")
    val inner = OracleSql.xxh64Long(OracleSql.s2u("a"))
    val sql =
      s"""WITH t(a, b) AS (VALUES $values)
         |SELECT ${OracleSql.u2s(OracleSql.xxh64Long(OracleSql.s2u("b"), inner))} AS h FROM t""".stripMargin
    val got = duckdb(sql).map(_.toLong)
    pairs.indices.foreach { i =>
      assert(got(i) == expected(i), s"pair=${pairs(i)}")
    }
  }
}
