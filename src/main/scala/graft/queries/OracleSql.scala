package graft.queries

/** DuckDB SQL code generator that reproduces Spark's `xxhash64` (the
  * public xxHash64 algorithm, Spark's default seed 42) bit-for-bit, so the
  * LSH/sketch queries (minhash, simhash, frame fingerprints, stub decode)
  * can carry EXACT DuckDB oracles instead of rows-only checks.
  *
  * Technique: unsigned-64 arithmetic emulated in HUGEINT (int128) mod
  * 2^64. A 64x64->64 wrapping multiply would overflow int128, so it is
  * split 32/64: (a*b) mod 2^64 = (alo*b + ((ahi*blo) mod 2^32)*2^32) mod
  * 2^64. Rotations/shifts become divisions by powers of two (state is kept
  * in [0, 2^64), so all shifts are logical). `xor()` works on HUGEINT
  * natively.
  *
  * Local variable binding uses `list_transform([e], v -> body)[1]` —
  * DuckDB's only lambda binder — which keeps generated SQL size LINEAR in
  * algorithm length (naive textual substitution would blow up
  * exponentially through the avalanche steps).
  *
  * Everything here mirrors the public xxHash64 spec (github.com/Cyan4973
  * /xxHash, BSD) as implemented by Spark's
  * `org.apache.spark.sql.catalyst.expressions.XXH64`; `OracleXxhSpec`
  * cross-validates every length class (empty / <4 / <8 / <32 / >=32 /
  * stripe remainders) plus the long-input path against Spark itself.
  */
object OracleSql {
  private val M = BigInt(1) << 64
  private val Ms = M.toString

  private def u(x: Long): BigInt = BigInt(x) & (M - 1)
  val P1: BigInt = u(-7046029288634856825L) // 0x9E3779B185EBCA87
  val P2: BigInt = u(-4417276706812531889L) // 0xC2B2AE3D27D4EB4F
  val P3: BigInt = BigInt(1609587929392839161L)
  val P4: BigInt = u(-8796714831421723037L) // 0x85EBCA77C2B2AE63
  val P5: BigInt = BigInt(2870177450012600261L)

  // Unique lambda-variable names; object init is single-threaded but keep
  // it race-free for reuse from tests.
  private val ctr = new java.util.concurrent.atomic.AtomicInteger(0)
  private def fresh(p: String): String = p + "_" + ctr.incrementAndGet()

  /** let-binding: evaluate `expr` once, reference it many times. */
  def bind(expr: String)(body: String => String): String = {
    val v = fresh("__b")
    s"list_transform([($expr)], $v -> ${body(v)})[1]"
  }

  def u64(x: String): String = s"(($x) % $Ms)"

  /** (a*b) mod 2^64; a,b in [0,2^64). */
  def mul64(a: String, b: String): String =
    bind(a) { av =>
      bind(b) { bv =>
        s"(((($av) % 4294967296) * ($bv) + (((($av) // 4294967296) * (($bv) % 4294967296)) % 4294967296) * 4294967296) % $Ms)"
      }
    }
  def mul64(a: String, b: BigInt): String = mul64(a, b.toString)

  def xor64(a: String, b: String): String = s"xor(($a)::HUGEINT, ($b)::HUGEINT)"
  def shr(x: String, r: Int): String = s"(($x) // ${(BigInt(1) << r).toString})"

  /** rotl: state < 2^64 makes hi/lo parts disjoint, so + is |. */
  def rotl(x: String, r: Int): String = {
    val loMod = (BigInt(1) << (64 - r)).toString
    val mul = (BigInt(1) << r).toString
    bind(x) { xv => s"(((($xv) % $loMod) * $mul) + (($xv) // $loMod))" }
  }

  /** xxh64 round: mul64(rotl31(acc + lane*P2), P1). */
  def round(acc: String, lane: String): String =
    mul64(rotl(u64(s"($acc) + ${mul64(lane, P2)}"), 31), P1)

  private def mergeRound(h: String, v: String): String =
    u64(s"${mul64(xor64(h, round("0", v)), P1)} + $P4")

  def avalanche(h: String): String =
    bind(h) { h0 =>
      bind(mul64(xor64(h0, shr(h0, 33)), P2)) { h2 =>
        bind(mul64(xor64(h2, shr(h2, 29)), P3)) { h4 =>
          xor64(h4, shr(h4, 32))
        }
      }
    }

  /** Little-endian u64 lane at 0-based byte offset `off` (short expr!). */
  private def lane8(bs: String, off: String): String =
    (0 until 8)
      .map(i => s"($bs)[($off)+${i + 1}]" + (if (i == 0) "" else s"*${BigInt(1) << (8 * i)}"))
      .mkString("(", " + ", ")")

  private def lane4(bs: String, off: String): String =
    (0 until 4)
      .map(i => s"($bs)[($off)+${i + 1}]" + (if (i == 0) "" else s"*${BigInt(1) << (8 * i)}"))
      .mkString("(", " + ", ")")

  /** >=32-byte stripe fold with 4 interleaved accumulators, then merge. */
  private def stripeFold(bs: String, n: String, seed: String): String = {
    val i = fresh("__i")
    val elems =
      s"""list_transform(range(($n) // 32), $i -> struct_pack(
         |  a := ${lane8(bs, s"($i*32)")},
         |  b := ${lane8(bs, s"($i*32+8)")},
         |  c := ${lane8(bs, s"($i*32+16)")},
         |  d := ${lane8(bs, s"($i*32+24)")}))""".stripMargin
    val init =
      s"""struct_pack(
         |  a := ${u64(s"($seed) + ${(P1 + P2) % M}")},
         |  b := ${u64(s"($seed) + $P2")},
         |  c := (($seed))::HUGEINT,
         |  d := ${u64(s"($seed) + ${(M - P1) % M}")})""".stripMargin
    val a = fresh("__a"); val e = fresh("__e")
    val folded =
      s"""list_reduce(list_prepend($init, $elems), ($a, $e) -> struct_pack(
         |  a := ${round(s"$a.a", s"$e.a")},
         |  b := ${round(s"$a.b", s"$e.b")},
         |  c := ${round(s"$a.c", s"$e.c")},
         |  d := ${round(s"$a.d", s"$e.d")}))""".stripMargin
    bind(folded) { f =>
      bind(u64(s"${rotl(s"$f.a", 1)} + ${rotl(s"$f.b", 7)} + ${rotl(s"$f.c", 12)} + ${rotl(s"$f.d", 18)}")) { h0 =>
        mergeRound(mergeRound(mergeRound(mergeRound(h0, s"$f.a"), s"$f.b"), s"$f.c"), s"$f.d")
      }
    }
  }

  private def tail8(bs: String, n: String, h: String): String = {
    val j = fresh("__j"); val a = fresh("__a"); val l = fresh("__l")
    bind(h) { hv =>
      s"""list_reduce(list_prepend($hv,
         |  list_transform(range((($n) % 32) // 8), $j -> ${lane8(bs, s"((($n) // 32) * 32 + $j * 8)")})),
         |  ($a, $l) -> ${u64(s"${mul64(rotl(xor64(a, round("0", l)), 27), P1)} + $P4")})""".stripMargin
    }
  }

  private def tail4(bs: String, n: String, h: String): String =
    bind(h) { hv =>
      s"""(CASE WHEN (($n) % 8) >= 4
         | THEN ${u64(s"${mul64(rotl(xor64(hv, mul64(lane4(bs, s"(($n) - (($n) % 8))"), P1)), 23), P2)} + $P3")}
         | ELSE $hv END)""".stripMargin
    }

  private def tail1(bs: String, n: String, h: String): String = {
    val j = fresh("__j"); val a = fresh("__a"); val b = fresh("__byt")
    bind(h) { hv =>
      s"""list_reduce(list_prepend($hv,
         |  list_transform(range(($n) % 4), $j -> ($bs)[($n) - (($n) % 4) + $j + 1])),
         |  ($a, $b) -> ${mul64(rotl(xor64(a, mul64(b, P5)), 11), P1)})""".stripMargin
    }
  }

  /** Full XXH64 over a list of byte values (HUGEINT elements in [0,255]);
    * result unsigned in [0, 2^64). `seed` may be any SQL expr in u64. */
  def xxh64Bytes(bytesExpr: String, seed: String = "42"): String =
    bind(bytesExpr) { bs =>
      bind(s"len($bs)") { n =>
        avalanche(
          tail1(bs, n, tail4(bs, n, tail8(bs, n,
            s"""((CASE WHEN ($n) >= 32 THEN ${stripeFold(bs, n, seed)}
               |  ELSE ${u64(s"($seed) + $P5")} END) + ($n)) % $Ms""".stripMargin))))
      }
    }

  /** XXH64 of one u64 value (Spark `XXH64.hashLong`): the 8-byte path. */
  def xxh64Long(vExpr: String, seed: String = "42"): String =
    bind(vExpr) { v =>
      bind(seed) { s =>
        avalanche(
          bind(u64(s"($s) + $P5 + 8")) { h =>
            u64(s"${mul64(rotl(xor64(h, round("0", v)), 27), P1)} + $P4")
          })
      }
    }

  /** UTF-8 bytes of an ASCII string expr as HUGEINT list (documents.text
    * is pure ASCII at every SF — TESTDATA.md). Empty string -> []. */
  def asciiBytes(strExpr: String): String = {
    val c = fresh("__c")
    s"(CASE WHEN ($strExpr) = '' THEN [] ELSE list_transform(string_split(($strExpr), ''), $c -> ascii($c)::HUGEINT) END)"
  }

  /** xxhash64 of an ASCII string expr, unsigned. */
  def xxh64Ascii(strExpr: String, seed: String = "42"): String =
    xxh64Bytes(asciiBytes(strExpr), seed)

  /** unsigned [0,2^64) -> signed two's-complement (Spark LongType). */
  def u2s(uExpr: String): String =
    bind(uExpr) { v => s"(CASE WHEN $v >= ${(BigInt(1) << 63).toString} THEN $v - $Ms ELSE $v END)" }

  /** signed long -> unsigned u64. */
  def s2u(sExpr: String): String = u64(s"(($sExpr)::HUGEINT + $Ms)")

  private def foldSum(listExpr: String): String = {
    val x = fresh("__s"); val y = fresh("__t")
    s"list_reduce($listExpr, ($x, $y) -> $x + $y)"
  }

  /** Cosine similarity with the EXACT double-op order of the Spark kernel
    * ([[graft.functions.expressions.SketchUtil.cosine]]): left-fold dot and
    * norms, sqrt*sqrt, 0.0 on zero norm. IEEE +,*,sqrt are correctly
    * rounded, so identical op order => identical bits — safe to round at
    * any precision on both sides. Inputs must be non-empty DOUBLE[]. */
  def cosineExact(aExpr: String, bExpr: String): String =
    bind(aExpr) { a =>
      bind(bExpr) { b =>
        val i = fresh("__i"); val j = fresh("__j"); val k = fresh("__k")
        val d = foldSum(s"list_transform(range(least(len($a), len($b))), $i -> ($a)[$i+1] * ($b)[$i+1])")
        val na = foldSum(s"list_transform(range(len($a)), $j -> ($a)[$j+1] * ($a)[$j+1])")
        val nb = foldSum(s"list_transform(range(len($b)), $k -> ($b)[$k+1] * ($b)[$k+1])")
        bind(d) { dv =>
          bind(s"sqrt($na) * sqrt($nb)") { norm =>
            s"(CASE WHEN $norm = 0 THEN 0.0 ELSE $dv / $norm END)"
          }
        }
      }
    }
}
