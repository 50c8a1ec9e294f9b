package graft

import org.apache.spark.sql.functions._
import graft.operators.{Joins, Melt}

/** Reference-surface semantics of the Frame facade, joins and melt
  * (golden behaviors from SURVEY §2 / FIXTURES.md). */
class FrameSpec extends SparkSpec {

  import spark.implicits._

  lazy val managers = Seq(
    (1L, "Joe", 38L, 80000.0),
    (2L, "Sarah", 41L, 95000.0)).toDF("id", "manager", "age", "pay")

  lazy val employees = Seq(
    (1L, "Fred", 28L, 40000.0, 1L),
    (2L, "Sally", 29L, 50000.0, 2L),
    (3L, "Bob", 30L, 45000.0, 1L)).toDF("id", "employee", "age", "pay", "manager_id")

  test("select projects and reorders") {
    val got = Frame(managers).select("pay", "manager")
    assert(got.df.columns.toSeq == Seq("pay", "manager"))
  }

  test("withColumns updates a subset, keeps the rest (rsubset semantics)") {
    val got = Frame(managers)
      .withColumns(Map("pay" -> (col("pay") * 2)))
      .df.orderBy("id").collect()
    assert(got.map(_.getAs[Double]("pay")).toSeq == Seq(160000.0, 190000.0))
    assert(got.head.getAs[String]("manager") == "Joe")
  }

  test("join output schema = left ++ (right minus keys) (mergeRec order)") {
    val l = employees.withColumnRenamed("id", "eid")
      .withColumnRenamed("manager_id", "id")
    val got = Joins.innerJoin(Seq("id"))(
      l.select("id", "employee", "pay"),
      managers.select("id", "manager"))
    assert(got.columns.toSeq == Seq("id", "employee", "pay", "manager"))
    assert(got.count() == 3)
  }

  test("salted join equals the plain join (inner and left), hot key spread over salts") {
    import org.apache.spark.sql.functions.{col, struct}
    // hot key: 1000 left rows share k=1; right has k=1..3
    val l = spark.range(1010)
      .select(
        (when(col("id") < 1000, 1L).otherwise(col("id") - 998L)).as("k"),
        col("id").as("rowid"))
    val r = Seq((1L, "a"), (2L, "b"), (3L, "c"), (99L, "z")).toDF("k", "rv")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getAs[String]("rv"))).toSet
    for (how <- Seq("inner", "left")) {
      val plain = rows(l.join(r, Seq("k"), how))
      val salted = rows(
        Joins.saltedJoin(Seq("k"), struct(col("rowid")), factor = 8, how = how)(l, r))
      assert(plain == salted, s"$how salted join diverges from plain")
    }
    // the hot key's 1000 rows must actually land on several salt values
    val salts = l.filter(col("k") === 1L)
      .select(org.apache.spark.sql.functions
        .pmod(org.apache.spark.sql.functions.xxhash64(struct(col("rowid"))), lit(8)))
      .distinct().count()
    assert(salts >= 6, s"hot key used only $salts of 8 salts")
  }

  test("outer join nulls only the unmatched side (documented divergence)") {
    val l = Seq((1L, "a"), (2L, "b")).toDF("k", "lv")
    val r = Seq((2L, "x"), (3L, "y")).toDF("k", "rv")
    val got = Joins.outerJoin(Seq("k"))(l, r).orderBy("k").collect()
    assert(got.length == 3)
    assert(got(0).isNullAt(2) && !got(0).isNullAt(1))
    assert(got(2).isNullAt(1) && !got(2).isNullAt(2))
  }

  test("melt stacks value columns; row count = n x |value cols|") {
    val got = Melt.melt(managers, idCols = Seq("id", "manager"))
    assert(got.columns.toSeq == Seq("id", "manager", "variable", "value"))
    assert(got.count() == 4) // 2 rows x (age, pay)
    val joe = got.filter(col("manager") === "Joe")
      .orderBy("variable").collect()
    assert(joe.map(_.getAs[String]("variable")).toSeq == Seq("age", "pay"))
    assert(joe.map(_.getAs[Double]("value")).toSeq == Seq(38.0, 80000.0))
  }

  test("melt of mixed types falls back to string value column") {
    val df = Seq((1L, "x", 2.5)).toDF("id", "s", "d")
    val got = Melt.melt(df, idCols = Seq("id"))
    assert(got.schema("value").dataType.typeName == "string")
  }

  test("pivot inverts melt for pinned values") {
    val melted = Melt.melt(managers.select("id", "age", "pay"), idCols = Seq("id"))
    val back = Melt.pivot(melted, Seq("id"), "variable", "value", Seq("age", "pay"))
      .orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq ==
      Seq((1L, 38.0, 80000.0), (2L, 41.0, 95000.0)))
  }

  test("concat is UNION ALL by name") {
    val a = managers.select("id", "pay")
    val b = managers.select("pay", "id") // different order, same names
    assert(Frame(a).concat(Frame(b)).df.count() == 4)
  }

  test("concatEvolved null-fills missing columns in both directions") {
    val a = managers.select("id", "pay")
    val b = managers.select(col("id"), lit("new").as("tag"))
    val got = Frame(a).concatEvolved(Frame(b)).df
    assert(got.columns.toSeq == Seq("id", "pay", "tag"))
    assert(got.count() == 4)
    assert(got.filter(col("tag").isNull).count() == 2) // old shard rows
    assert(got.filter(col("pay").isNull).count() == 2) // new shard rows
    // strict concat must still reject the mismatch
    intercept[org.apache.spark.sql.AnalysisException](
      Frame(a).concat(Frame(b)).df.collect())
  }

  test("takeRows/dropRows slice deterministically under explicit order") {
    val taken = Frame(managers).takeRows(1, Seq(col("id"))).df.collect()
    assert(taken.map(_.getLong(0)).toSeq == Seq(1L))
    val dropped = Frame(managers).dropRows(1, Seq(col("id"))).df.collect()
    assert(dropped.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("zip matches rows by rank, truncates to shorter input") {
    val left = Seq("a", "b", "c").toDF("l")
    val right = Seq((10L, "x"), (20L, "y")).toDF("k", "r")
    val got = Frame(left)
      .zip(Seq(col("l")), Frame(right), Seq(col("k")))
      .df.orderBy("l").collect()
    assert(got.length == 2)
    assert(got.map(r => (r.getAs[String]("l"), r.getAs[String]("r"))).toSeq ==
      Seq(("a", "x"), ("b", "y")))
  }

  test("chunkIds assigns consecutive chunks of the requested size") {
    val df = (1 to 25).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val got = Frame(df).chunkIds(10, Seq(col("id"))).df
      .groupBy("chunk").count().orderBy("chunk").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 10L), (1L, 10L), (2L, 5L)))
  }

  test("concatMap is monadic bind: empty generators vanish, outer keeps them") {
    val df = Seq(
      (1L, Seq("a", "b")),
      (2L, Seq.empty[String]),
      (3L, Seq("c"))).toDF("id", "xs")
    val bound = Frame(df).concatMap(col("xs"), "x").df
      .select("id", "x").orderBy("id", "x").collect()
    assert(bound.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (1L, "b"), (3L, "c")))
    val outer = Frame(df).concatMapOuter(col("xs"), "x").df
    assert(outer.count() == 4) // id=2 survives with null element
    val withPos = Frame(df).concatMapWithPosition(col("xs"), "pos", "x").df
      .filter(col("id") === 1L).orderBy("pos").collect()
    assert(withPos.map(r => (r.getAs[Int]("pos"), r.getAs[String]("x"))).toSeq ==
      Seq((0, "a"), (1, "b")))
  }

  test("concatMap satisfies left identity with a computed generator") {
    // return x >>= f == f x: a single row bound through a sequence
    // generator expands exactly to the generator's image.
    val one = Seq(Tuple1(3L)).toDF("n")
    val got = Frame(one)
      .concatMap(sequence(lit(1L), col("n")), "i").df
      .select("i").orderBy("i").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("inCore caches the plan and keeps results identical") {
    val f = Frame(managers.select("id", "pay")).inCore()
    assert(f.df.storageLevel.useMemory)
    assert(f.df.count() == 2)
    assert(f.df.orderBy("id").collect().map(_.getDouble(1)).toSeq ==
      Seq(80000.0, 95000.0))
    f.df.unpersist()
  }

  test("fillNa / dropNa mirror MissingData defaults and recMaybe") {
    val df = Seq[(java.lang.Long, String)]((1L, null), (null, "b"), (2L, "c"))
      .toDF("a", "s")
    assert(Frame(df).dropNa().df.count() == 1)
    val filled = Frame(df).fillNa(Map("a" -> 0L, "s" -> "?")).df
      .orderBy("a").collect()
    assert(filled.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((0L, "b"), (1L, "?"), (2L, "c")))
  }

  test("asofJoin attaches the latest right row at-or-before, nulls before any") {
    val ts = (m: Long) => new java.sql.Timestamp(m * 60000L)
    val left = Seq(
      (1L, 10L, ts(5)), (2L, 10L, ts(15)), (3L, 10L, ts(30)),
      (4L, 20L, ts(10))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(5), 100.0), (10L, ts(20), 200.0),
      (20L, ts(11), 999.0)).toDF("user_id", "ts", "px")
    val got = Joins.asofJoin(left, right, Seq("user_id"), "ts", Seq("px"))
      .orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)))
    assert(got.toSeq == Seq(
      (1L, Some(100.0)),   // exact tie: right at same ts is visible (<=)
      (2L, Some(100.0)),   // before the 20m purchase
      (3L, Some(200.0)),   // after it
      (4L, None)))         // user 20: no purchase at/before 10m
  }

  test("asofJoin tolerance nulls stale matches; values stay row-consistent") {
    val ts = (m: Long) => new java.sql.Timestamp(m * 60000L)
    val left = Seq(
      (1L, 10L, ts(5)), (2L, 10L, ts(90)), (3L, 10L, ts(125)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts(4), 100.0, "a"), (10L, ts(120), 200.0, "b"))
      .toDF("user_id", "ts", "px", "tag")
    val got = Joins.asofJoin(left, right, Seq("user_id"), "ts",
        Seq("px", "tag"), toleranceSeconds = Some(3600L))
      .orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Double]("px")).map(_.toDouble),
        Option(r.getAs[String]("tag"))))
    assert(got.toSeq == Seq(
      (1L, Some(100.0), Some("a")),  // 1 minute old: fresh
      (2L, None, None),              // 86 minutes old: stale, BOTH nulled
      (3L, Some(200.0), Some("b")))) // 5 minutes old: fresh, same row
  }

  test("asofJoin forward and nearest directions match pandas semantics") {
    val ts = (m: Long) => new java.sql.Timestamp(m * 60000L)
    val left = Seq((1L, 10L, ts(10)), (2L, 10L, ts(29)), (3L, 10L, ts(100)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts(8), 1.0), (10L, ts(30), 2.0))
      .toDF("user_id", "ts", "px")
    def run(direction: String, tol: Option[Long] = None) =
      Joins.asofJoin(left, right, Seq("user_id"), "ts", Seq("px"), tol, direction)
        .orderBy("event_id").collect()
        .map(r => Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)).toSeq
    // forward: earliest right at-or-after; none after 100m
    assert(run("forward") == Seq(Some(2.0), Some(2.0), None))
    // nearest: 10m->8m (2 vs 20), 29m->30m (1 vs 21), 100m->30m
    assert(run("nearest") == Seq(Some(1.0), Some(2.0), Some(2.0)))
    // nearest with tolerance: the 70-minute-stale match at 100m drops
    assert(run("nearest", Some(600L)) == Seq(Some(1.0), Some(2.0), None))
    // equal distance resolves backward: left at 19m is 11m from both
    val mid = Seq((9L, 10L, ts(19))).toDF("event_id", "user_id", "ts")
    val got = Joins.asofJoin(mid, right, Seq("user_id"), "ts", Seq("px"), None, "nearest")
      .collect().map(_.getAs[Double]("px"))
    assert(got.toSeq == Seq(1.0))
  }

  test("intervalJoin equals the naive BETWEEN join, without nested loops") {
    val ts = (m: Long) => new java.sql.Timestamp(m * 60000L)
    val points = (0L until 200L by 7L).map(m => (m, ts(m))).toDF("pid", "ts")
    val intervals = Seq(
      (1L, ts(10), ts(40)), (2L, ts(35), ts(60)), // overlapping intervals
      (3L, ts(150), ts(150)), (4L, ts(500), ts(600))) // point-width + empty
      .toDF("iid", "lo", "hi")
    val got = Joins.intervalJoin(points, "ts", intervals, "lo", "hi", binSeconds = 600)
      .select("pid", "iid").orderBy("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = points.join(
        intervals, col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("pid", "iid").orderBy("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == naive.toSeq)
    assert(got.nonEmpty && got.count(_._2 == 4L) == 0)
    // a point inside both overlapping intervals appears once per interval
    assert(got.count(_._1 == 35L) == 2)
  }

  test("fold aggregator reproduces the reference UncurryFold golden (4, 3344.5)") {
    import graft.operators.Folds
    // prestigePartial: income column with missing cells dropped
    // (/root/reference/test/UncurryFoldPartialData.hs:23-30)
    val incomes = Seq(Some(1500.0), None, Some(844.5), Some(500.0), None, Some(500.0))
      .toDF("income")
    val ds = incomes.na.drop().select(col("income")).as[Double]
    val (n, sum) = ds.select(Folds.countAndSum).head()
    assert((n, sum) == ((4L, 3344.5)))
  }

  test("showFrame renders header + separator-joined rows") {
    val s = Frame(managers.orderBy("id")).showFrame(" | ")
    val lines = s.split("\n")
    assert(lines(0) == "id | manager | age | pay")
    assert(lines(1) == "1 | Joe | 38 | 80000.0")
  }
}
