package graft

import org.apache.spark.sql.functions._
import graft.operators.Linkage
import graft.operators.Linkage.FieldSpec

class LinkageSpec extends SparkSpec {

  private def fields = Seq(
    FieldSpec("name", (x, y) => x === y, m = 0.9, u = 0.01),
    FieldSpec("city", (x, y) => x === y, m = 0.8, u = 0.2))

  test("fellegiSunter: per-field weights, three-way decision, block containment") {
    import spark.implicits._
    val a = Seq(
      (1L, 10, "ada", "paris"),
      (2L, 10, "bob", "lyon"),
      (3L, 20, "cyd", "rome"))
      .toDF("id", "blk", "name", "city")
    val b = Seq(
      (101L, 10, "ada", "paris"), // full agree with 1
      (102L, 10, "bob", "nice"),  // name-only agree with 2
      (103L, 20, "zoe", "rome"),  // city-only agree with 3
      (104L, 30, "ada", "paris")) // would match 1 but wrong block
      .toDF("id", "blk", "name", "city")
    val wNa = Linkage.weight(0.9, 0.01)
    val wNd = Linkage.weight(0.1, 0.99)
    val wCa = Linkage.weight(0.8, 0.2)
    val wCd = Linkage.weight(0.2, 0.8)
    val got = Linkage.fellegiSunter(
        a, b, "id", Seq("blk"), fields,
        lower = -100.0, upper = wNa + wCd) // name agreement alone decides
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getString(3))).toMap
    // blocking: only same-block pairs exist; 104 never pairs with 1
    assert(got.keySet == Set(
      (1L, 101L), (1L, 102L), (2L, 101L), (2L, 102L), (3L, 103L)))
    assert(got((1L, 101L)) == (wNa + wCa, "match"))
    assert(got((2L, 102L)) == (wNa + wCd, "match"))
    assert(got((3L, 103L)) == (wNd + wCa, "possible"))
    assert(got((1L, 102L))._1 == wNd + wCd)
    // evidence ordering: full agree > partial > none
    assert(got((1L, 101L))._1 > got((2L, 102L))._1)
    assert(got((2L, 102L))._1 > got((1L, 102L))._1)
  }

  test("fellegiSunter: lower threshold filters, null blocks drop, maxBlock caps by id order") {
    import spark.implicits._
    val a = (1L to 6L).map(i => (i, Some(1), s"n$i", "c")).toDF("id", "blk", "name", "city")
    val b = Seq((100L, Some(1), "n1", "c"), (101L, Option.empty[Int], "n1", "c"))
      .toDF("id", "blk", "name", "city")
    // cap a's block at 3: only ids 1..3 survive (row_number by id)
    val capped = Linkage.fellegiSunter(
        a, b, "id", Seq("blk"), fields,
        lower = -100.0, upper = 100.0, maxBlock = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 100L), (2L, 100L), (3L, 100L)))
    // null-block b row never joined anywhere
    assert(!capped.exists(_._2 == 101L))
    // lower threshold: keep only pairs with a name agreement
    val thresh = Linkage.fellegiSunter(
        a, b, "id", Seq("blk"), fields, lower = 0.0, upper = 100.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(thresh == Set((1L, 100L)))
  }

  test("cappedBlocks: detects a binding cap; empty on the d24/d26/d27 block keys") {
    import spark.implicits._
    // mechanism: a 6-row block against maxBlock=3 reports exactly the
    // overflow the fellegiSunter cap would drop
    val a = (1L to 6L).map(i => (i, Some(1), s"n$i", "c"))
      .toDF("id", "blk", "name", "city")
      .union(Seq((7L, Option.empty[Int], "n7", "c"))
        .toDF("id", "blk", "name", "city")) // null block never counts
    val hot = Linkage.cappedBlocks(a, Seq("blk"), maxBlock = 3).collect()
    assert(hot.length == 1)
    assert(hot.head.getAs[Int]("blk") == 1)
    assert(hot.head.getAs[Long]("block_rows") == 6L &&
      hot.head.getAs[Long]("dropped") == 3L)
    // and when the cap binds, the result really is a strict subset
    val uncapped = Linkage.fellegiSunter(
        a, a, "id", Seq("blk"), fields, lower = -100.0, upper = 100.0)
      .count()
    val capped = Linkage.fellegiSunter(
        a, a, "id", Seq("blk"), fields, lower = -100.0, upper = 100.0,
        maxBlock = 3)
      .count()
    assert(uncapped == 36L && capped == 9L)
    assert(Linkage.cappedBlocks(a, Seq("blk"), maxBlock = 6).isEmpty)
    // contract guard: the registered d24/d26/d27 oracles replay the
    // blocking join UNCAPPED, which is only equivalent while no block
    // on either side reaches maxBlock=10000. Pin that for every block
    // key the three queries use — (nat, np), (nat, name), (nat, band)
    // — on the driver corpus (block sizes grow ~linearly in SF; the
    // sf1 check lives in the scale sweep).
    val c = Tables(spark, sf0001).customer
    val cents = round((col("c_acctbal") + 1000.0) * 100.0, 0).cast("long")
    val keyed = c.select(
      col("c_nationkey").as("nat"),
      substring(lower(col("c_name")), 1, 16).as("np"),
      lower(col("c_name")).as("name"),
      floor(cents / 5).as("band"))
    for (key <- Seq(Seq("nat", "np"), Seq("nat", "name"), Seq("nat", "band")))
      assert(Linkage.cappedBlocks(keyed, key).isEmpty,
        s"block key $key would overflow fellegiSunter's cap")
  }

  test("fellegiSunter: weight quantization is driver-side and 6dp") {
    val w = Linkage.weight(0.9, 0.01)
    assert(w == math.rint(math.log(90.0) / math.log(2.0) * 1e6) / 1e6)
    assert((w * 1e6) == math.rint(w * 1e6))
    intercept[IllegalArgumentException] {
      FieldSpec("x", (a, b) => a === b, m = 0.5, u = 0.5) // m must exceed u
    }
  }
}
