package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Randomized invariants for [[Curation.canonicalizeUrl]] over
  * generated http(s) URLs covering every variant axis the fixture
  * suite (CurationSpec) pins pointwise. The dedup-key contract is
  * IDEMPOTENCE — canon(canon(u)) == canon(u) — plus variant-class
  * collapse: any two URLs differing only in scheme/host case, default
  * port, fragment, tracking params, param order, or trailing slashes
  * must share one canonical key. Seeded, deterministic. */
class CurationPropSpec extends SparkSpec {

  private val rnd = new Random(42)

  private def genVariants(i: Int): (Long, String, String) = {
    // one logical resource per i; emit a random variant of it
    val scheme = if (rnd.nextBoolean()) "https" else "HTTPS"
    val host = {
      val h = s"site${i % 17}.example.com"
      if (rnd.nextBoolean()) h.toUpperCase else h
    }
    val port = if (rnd.nextBoolean()) ":443" else ""
    val path = s"/p/${i % 17}" + (if (rnd.nextBoolean()) "/" else "")
    val goodParams = Seq(s"id=${i % 17}", "b=2", "a=1")
    val junkParams = Seq("utm_source=x", "utm_campaign=c", "fbclid=z",
      "gclid=g", "ref=tw").filter(_ => rnd.nextBoolean())
    val params = rnd.shuffle(goodParams ++ junkParams).mkString("&")
    val frag = if (rnd.nextBoolean()) "#sec" else ""
    val url = s"$scheme://$host$port$path?$params$frag"
    val canonical = s"https://site${i % 17}.example.com/p/${i % 17}" +
      s"?a=1&b=2&id=${i % 17}"
    (i.toLong, url, canonical)
  }

  test("canonicalizeUrl: idempotent and variant-class-collapsing on 400 random URLs") {
    import spark.implicits._
    val rows = (1 to 400).map(genVariants)
    val df = rows.toDF("id", "url", "expected")
      .withColumn("c1", Curation.canonicalizeUrl(col("url")))
      .withColumn("c2", Curation.canonicalizeUrl(col("c1")))
    val got = df.collect()
    got.foreach { r =>
      assert(r.getAs[String]("c1") == r.getAs[String]("expected"),
        s"variant collapse failed for ${r.getAs[String]("url")}")
      assert(r.getAs[String]("c2") == r.getAs[String]("c1"),
        s"not idempotent for ${r.getAs[String]("url")}")
    }
  }
}
