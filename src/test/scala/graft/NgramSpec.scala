package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{ngrams, tokens}

/** Edge cases of the scan-local n-gram generator. */
class NgramSpec extends SparkSpec {

  import spark.implicits._

  private def grams(text: String, n: Int): Seq[String] =
    Seq(text).toDF("t")
      .select(ngrams(tokens(col("t")), n).as("g"))
      .collect().head.getSeq[String](0)

  test("bigrams slide over full windows only") {
    assert(grams("a b c d", 2) == Seq("a b", "b c", "c d"))
    assert(grams("a b c d", 3) == Seq("a b c", "b c d"))
  }

  test("short and empty documents yield no n-grams") {
    assert(grams("solo", 2).isEmpty)
    assert(grams("", 2).isEmpty)
    assert(grams("a b", 4).isEmpty)
  }

  test("n=1 is the token stream; n>=1 enforced") {
    assert(grams("x  y\tz", 1) == Seq("x", "y", "z"))
    intercept[IllegalArgumentException](ngrams(col("t"), 0))
  }
}
