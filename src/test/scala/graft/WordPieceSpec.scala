package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.WordPieceOps

/** WordPiece greedy longest-match encoding: BERT reference semantics
  * (longest piece wins, `##` continuations, whole-word [UNK], long-word
  * guard), Spark-vs-driver parity on the real corpus, and the
  * transform-lambda vs explode plan equivalence. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val bertish = Seq(
    "un", "##aff", "##able", "aff", "##a", "##b", "##l", "##e",
    "a", "b", "l", "e", "u", "n", "f")

  test("the BERT reference example: un ##aff ##able") {
    val t = WordPieceOps.table(bertish)
    assert(WordPieceOps.encode("unaffable", t) == Seq("un", "##aff", "##able"))
  }

  test("longest match wins over a shorter valid segmentation") {
    // both "aff" and "a|f|f..." could start; greedy takes "aff"; then
    // the longest continuation "##able" beats "##a ##b ##l ##e"
    val t = WordPieceOps.table(bertish)
    assert(WordPieceOps.encode("affable", t) == Seq("aff", "##able"))
  }

  test("whole-word [UNK]: one uncoverable position voids the word, not char fallback") {
    val t = WordPieceOps.table(bertish)
    // 'z' has no piece anywhere: the entire word is [UNK], even though
    // a prefix matched first
    assert(WordPieceOps.encode("unz", t) == Seq("[UNK]"))
    // a word with no valid START piece is [UNK] immediately
    assert(WordPieceOps.encode("zun", t) == Seq("[UNK]"))
  }

  test("continuation discipline: word-initial pieces never match interiors and vice versa") {
    // vocab has "un" (initial only) and "##un"? no — so "nun" needs
    // n, ##u, ##n; "##u" is absent -> [UNK]
    val t = WordPieceOps.table(bertish)
    assert(WordPieceOps.encode("nun", t) == Seq("[UNK]"))
    val t2 = WordPieceOps.table(bertish :+ "##u" :+ "##n")
    assert(WordPieceOps.encode("nun", t2) == Seq("n", "##u", "##n"))
  }

  test("long-word guard and the empty token") {
    val t = WordPieceOps.table(Seq("a", "##a"), maxInputChars = 8)
    assert(WordPieceOps.encode("a" * 8, t).length == 8)
    assert(WordPieceOps.encode("a" * 9, t) == Seq("[UNK]"))
    assert(WordPieceOps.encode("", t).isEmpty)
  }

  test("table validation: empty vocab, bad pieces, bad cap rejected") {
    intercept[IllegalArgumentException](WordPieceOps.table(Nil))
    intercept[IllegalArgumentException](WordPieceOps.table(Seq("a", "")))
    intercept[IllegalArgumentException](WordPieceOps.table(Seq("##")))
    intercept[IllegalArgumentException](WordPieceOps.table(Seq("a"), maxInputChars = 0))
  }

  test("column faces: transform-lambda equals explode; count equals pieces length") {
    val df = Seq((1L, "unaffable affable unz a"))
      .toDF("id", "text")
    val toks = graft.functions.TextFunctions.tokens(lower(col("text")))
    val viaTransform = df.select(flatten(transform(toks,
      tk => WordPieceOps.wordpiecePieces(tk, bertish))).as("ps"))
      .collect()(0).getSeq[String](0).toList
    val viaExplode = df
      .select(posexplode(toks).as(Seq("i", "tok")))
      .select(col("i"), WordPieceOps.wordpiecePieces(col("tok"), bertish).as("ps"))
      .orderBy("i").collect().flatMap(_.getSeq[String](1)).toList
    assert(viaTransform == viaExplode)
    assert(viaTransform ==
      List("un", "##aff", "##able", "aff", "##able", "[UNK]", "a"))
    val counts = df
      .select(posexplode(toks).as(Seq("i", "tok")))
      .select(WordPieceOps.wordpieceCount(col("tok"), bertish))
      .collect().map(_.getInt(0)).toList
    assert(counts == List(3, 2, 1, 1))
  }

  test("full t32 pipeline equals a driver-side replay on the real corpus") {
    val vocab = {
      val letters = ('a' to 'z').map(_.toString)
      letters ++ letters.map("##" + _) ++ Seq("scan", "the", "so", "##rt")
    }
    val t = WordPieceOps.table(vocab)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text"))
    val got = docs
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(lower(col("text"))).as("__ts"))
      .filter(size(col("__ts")) > 0)
      .select(col("doc_id"),
        flatten(transform(col("__ts"),
          tk => WordPieceOps.wordpiecePieces(tk, vocab))).as("__ps"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val expect = docs.collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty).toList
        r.getLong(0) -> toks.flatMap(w => WordPieceOps.encode(w, t))
      }.toMap
    assert(got.nonEmpty)
    got.foreach { case (k, v) => assert(v == expect(k), s"doc $k") }
  }
}
