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

  test("jaccard_sim and cosine_sim SQL forms work on array literals") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("""
      SELECT round(jaccard_sim(array('a','b','c'), array('b','c','d')), 6) AS j,
             round(cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS c""").head
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) == 1.0)
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
}
