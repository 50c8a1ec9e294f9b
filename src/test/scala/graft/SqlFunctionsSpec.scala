package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TextFunctions}
import graft.functions.expressions.RollingHash

/** The SQL registration path: every graft native expression callable from
  * `spark.sql`, equal to its Column-API form. */
class SqlFunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("registered SQL functions equal the Column API kernels") {
    GraftFunctions.registerAll(spark)
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"), col("text").cast("binary").as("blob"))
      .limit(30)
      .createOrReplaceTempView("docs_sql")

    val viaSql = spark.sql("""
      SELECT doc_id,
             rolling_hash(text) AS rh,
             text_stats(text).n_tokens AS nt,
             blob_stats(blob).byte_sum AS bs,
             byte_histogram(blob, 16)[0] AS h0,
             frame_fingerprints(blob, 64, 8)[0] AS f0,
             simhash64(split(lower(text), '\\s+')) AS sh
      FROM docs_sql ORDER BY doc_id""").collect()

    val viaCols = spark.table("docs_sql")
      .select(
        col("doc_id"),
        RollingHash.fingerprint(col("text")).as("rh"),
        TextFunctions.textStats(col("text")).getField("n_tokens").as("nt"),
        graft.functions.expressions.BlobStats(col("blob")).getField("byte_sum").as("bs"),
        graft.functions.expressions.ByteHistogram(col("blob"), 16).getItem(0).as("h0"),
        graft.functions.expressions.FrameFingerprints(col("blob"), 64, 8).getItem(0).as("f0"),
        graft.functions.expressions.Sketches.simhash64(split(lower(col("text")), "\\s+")).as("sh"))
      .orderBy("doc_id").collect()

    assert(viaSql.map(_.toSeq).toSeq == viaCols.map(_.toSeq).toSeq)
  }

  test("sketch aggregates and zorder are callable from SQL, equal to Column API") {
    GraftFunctions.registerAll(spark)
    (1L to 200L).flatMap(k => Seq.fill((k % 7).toInt + 1)(k)).toDF("v")
      .createOrReplaceTempView("vals_sql")
    // aggregates: HLL + CMS build/probe + bloom build/probe, via pure SQL
    val row = spark.sql("""
      WITH sk AS (SELECT hll_distinct(v) AS h, cms_sketch(v) AS cms,
                         bloom_agg(v, 65536, 4) AS bf
                  FROM vals_sql)
      SELECT h, cms_estimate(cms, 3L) AS est3,
             bloom_might_contain(bf, 7L, 4) AS has7,
             bloom_might_contain(bf, 999999L, 4) AS has_absent
      FROM sk""").head
    val viaCols = spark.table("vals_sql")
      .agg(graft.functions.expressions.HllDistinct(col("v"))).head.getDouble(0)
    assert(row.getDouble(0) == viaCols)
    assert(row.getLong(1) >= 4L) // v=3 appears (3%7)+1 = 4 times
    assert(row.getBoolean(2) && !row.getBoolean(3))
    // zorder: SQL form equals the Column form
    val z = spark.sql("SELECT zorder(8, 5L, 9L) AS z").head.getLong(0)
    val zc = spark.range(1)
      .select(graft.functions.expressions.ZOrderN(8)(lit(5L), lit(9L)).as("z"))
      .head.getLong(0)
    assert(z == zc)
  }

  test("jaccard_sim and cosine_sim SQL forms work on array literals") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("""
      SELECT round(jaccard_sim(array('a','b','c'), array('b','c','d')), 6) AS j,
             round(cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS c""").head
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) == 1.0)
  }

  test("dot_long matches the zip_with+aggregate composition exactly") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("""
      SELECT dot_long(array(3L, -2L, 1000000L), array(7L, 5L, 1000000L)) AS fused,
             aggregate(zip_with(array(3L, -2L, 1000000L), array(7L, 5L, 1000000L),
                       (x, y) -> x * y), 0L, (s, t) -> s + t) AS hof""").head
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) == 3L * 7 - 2 * 5 + 1000000L * 1000000L)
  }

  test("non-literal scalar parameters are rejected with a clear error") {
    GraftFunctions.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT byte_histogram(cast('ab' as binary), cast(rand()*4 as int))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("wrong arity raises a named argument-count error, not a MatchError") {
    GraftFunctions.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT rolling_hash('a', 2)").collect()
    }
    assert(e.getMessage.contains("rolling_hash expects 1 argument"))
  }

  test("vector/text helper functions: charNgrams, normalize, l2") {
    import graft.functions.VectorFunctions
    val row = Seq((Array(3.0, 4.0), Array(0.0, 0.0), "abcd")).toDF("v", "z", "t")
      .select(
        VectorFunctions.normalize(col("v")).as("unit"),
        VectorFunctions.norm2(VectorFunctions.normalize(col("v"))).as("unitNorm"),
        VectorFunctions.l2(col("v"), col("v")).as("selfDist"),
        VectorFunctions.l2(col("v"), col("z")).as("origDist"),
        TextFunctions.charNgrams(col("t"), 2).as("bigrams"))
      .head()
    assert(row.getSeq[Double](0) == Seq(0.6, 0.8))
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
    assert(row.getDouble(2) == 0.0)
    assert(row.getDouble(3) == 5.0)
    assert(row.getSeq[String](4) == Seq("ab", "bc", "cd"))
  }

  test("GraftExtensions injects every function without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext) // must not throw
  }

  test("repetition signals: known duplicate structure") {
    val df = Seq(
      ("a b c d", 0.0),       // all distinct
      ("a a a a", 0.75),      // 3 of 4 repeat
      ("", 0.0))              // empty
      .toDF("text", "want")
    val got = df
      .select(round(TextFunctions.dupTokenRatio(col("text")), 6).as("r"), col("want"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))

    // top token 'a' takes 3 of 5 tokens
    val top = df.sparkSession.range(1)
      .select(TextFunctions.topTokenRatio(lit("a b a c a")).as("t"))
      .head.getDouble(0)
    assert(math.abs(top - 0.6) < 1e-9)

    // "x y x y x y": 3-gram windows = 4, distinct = 2 -> ratio 0.5
    val sh = df.sparkSession.range(1)
      .select(TextFunctions.dupShingleRatio(lit("x y x y x y"), 3).as("s"))
      .head.getDouble(0)
    assert(math.abs(sh - 0.5) < 1e-9)
  }

  test("PII redaction replaces emails, IPs, phones and counts them") {
    val s = "write bob.smith+x@corp.example.org from 192.168.001.1 or call 555-123-4567 now"
    val row = spark.range(1)
      .select(
        TextFunctions.piiEmailCount(lit(s)).as("e"),
        TextFunctions.piiIpCount(lit(s)).as("i"),
        TextFunctions.piiPhoneCount(lit(s)).as("p"),
        TextFunctions.redactPii(lit(s)).as("r"))
      .head
    assert(row.getInt(0) == 1 && row.getInt(1) == 1 && row.getInt(2) == 1)
    assert(row.getString(3) ==
      "write <EMAIL> from <IP> or call <PHONE> now")

    // negatives: plain words, bare numbers, 5-digit groups stay untouched
    val neg = "meet at 5 o clock on 12-31 near gate 55555"
    val kept = spark.range(1)
      .select(TextFunctions.redactPii(lit(neg)).as("r")).head.getString(0)
    assert(kept == neg)
  }
}
