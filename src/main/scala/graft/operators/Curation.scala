package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Rule-based document filtering — the Gopher/C4/RefinedWeb-style
  * heuristic gate every web corpus passes through before model-based
  * scoring. Each rule is an independent boolean over the scan-local
  * quality kernels ([[graft.functions.TextFunctions]]); the output
  * keeps per-rule verdicts (for funnel diagnostics — which rule kills
  * how much) plus the conjunction.
  *
  * Scale shape: a pure projection. Every signal is a native one-pass
  * kernel (TextStats / TokenCounts) and identical kernel calls are
  * subexpression-eliminated, so the whole rule set costs one sweep per
  * row inside whole-stage codegen — no shuffle, no UDF, and the same
  * call runs as a stateless streaming select.
  *
  * Thresholds are deterministic double comparisons over exact integer
  * counts (single divisions — no summation-order sensitivity), so
  * verdicts replay exactly cross-engine.
  */
object Curation {

  /** Gopher-inspired thresholds, adapted to whitespace-token text. */
  final case class RuleThresholds(
      minWords: Int = 3,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 1.0,
      maxMeanWordLen: Double = 10.0,
      minAlphaRatio: Double = 0.5,
      maxDigitRatio: Double = 0.2,
      maxTopTokenRatio: Double = 0.3,
      minStopwords: Int = 2,
      stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is"))

  /** (idCol, n_words, r_word_count, r_word_len, r_alpha, r_digit,
    * r_repetition, r_stopwords, keep) — keep = every rule passes. */
  def ruleFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      t: RuleThresholds = RuleThresholds()): DataFrame = {
    val text = col(textCol)
    val nWords = tokenCount(text).cast("long")
    val sw = array(t.stopwords.map(lit): _*)
    // Materialize the token array once: subexpression elimination does
    // not reach inside lambda bodies, so referencing tokens(lower(text))
    // in the filter predicate would re-tokenize once per stopword.
    val nStop = size(filter(sw, w => array_contains(col("__ts"), w)))
    docs
      .withColumn("__ts", tokens(lower(text)))
      .select(
        col(idCol),
        nWords.as("n_words"),
        (nWords >= t.minWords && nWords <= t.maxWords).as("r_word_count"),
        (meanTokenLength(text) >= t.minMeanWordLen &&
          meanTokenLength(text) <= t.maxMeanWordLen).as("r_word_len"),
        (alphaRatio(text) >= t.minAlphaRatio).as("r_alpha"),
        (digitRatio(text) <= t.maxDigitRatio).as("r_digit"),
        (topTokenRatio(text) <= t.maxTopTokenRatio).as("r_repetition"),
        (nStop >= t.minStopwords).as("r_stopwords"))
      .withColumn("keep",
        col("r_word_count") && col("r_word_len") && col("r_alpha") &&
          col("r_digit") && col("r_repetition") && col("r_stopwords"))
  }

  /** SNAPSHOT DIFF — the data-governance face of corpus versioning:
    * which documents were ADDED, REMOVED, or CHANGED between two corpus
    * snapshots (a crawl refresh, a takedown pass, a re-extraction).
    * [[graft.queries.Corpus]]'s p22 fingerprint answers "are these
    * snapshots equal" in O(1) payload; this answers "what exactly
    * differs" with per-document rows — run the fingerprint first, diff
    * only when it flips.
    *
    * Output: (idCol, status) for every id in either snapshot, status in
    * {added, removed, changed, unchanged}; filter `!= 'unchanged'` for
    * the change list (the common call). Content equality is
    * xxhash64 over `contentCols` (computed IN-SCAN, so full text never
    * shuffles — the full-outer join moves (id, 8-byte hash) per side,
    * one keyed shuffle each; at 100 TB both sides prune to two columns
    * at the parquet scan). A 64-bit hash collision reads as
    * `unchanged`: the standard content-address tradeoff, shared with
    * every dedup family here. */
  def snapshotDiff(
      before: DataFrame,
      after: DataFrame,
      idCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "snapshotDiff needs at least one content column")
    def hashed(df: DataFrame, out: String) =
      df.select(col(idCol),
        xxhash64(contentCols.map(col): _*).as(out))
    hashed(before, "__hb")
      .join(hashed(after, "__ha"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__hb").isNull, lit("added"))
          .when(col("__ha").isNull, lit("removed"))
          .when(col("__hb") =!= col("__ha"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Blocklist phrase filter — the safety/NSFW gate every web corpus
    * passes (the C4 "bad words" step): count occurrences of any listed
    * phrase (word-boundary, case-insensitive) and flag documents over
    * `maxHits`. Phrases compile into ONE alternation regex ordered
    * longest-first, which makes Java's leftmost-FIRST alternation
    * agree with RE2's leftmost-LONGEST (DuckDB) on overlapping
    * phrases — the one cross-engine regex trap here. Phrases must be
    * plain lowercase word sequences (no regex metacharacters) so the
    * compiled pattern is a literal alternation.
    *
    * Scale shape: a pure projection — the pattern compiles once per
    * codegen task and each row pays one linear scan; no shuffle, no
    * UDF, streams stateless. This is the right shape to ~10³ phrases;
    * past that the upgrade path is an Aho–Corasick native kernel (the
    * t32 WordPiece addReferenceObj pattern), not a longer regex. */
  def blocklistFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrases: Seq[String],
      maxHits: Long = 0L): DataFrame = {
    require(phrases.nonEmpty, "blocklistFilter needs at least one phrase")
    require(maxHits >= 0L, s"maxHits must be >= 0, got $maxHits")
    val ok = "^[a-z0-9 ]+$".r
    phrases.foreach(p => require(ok.matches(p),
      s"phrases must be lowercase word sequences, got '$p'"))
    val pattern =
      phrases.sortBy(p => (-p.length, p)).mkString("\\b(?:", "|", ")\\b")
    docs.select(
      col(idCol),
      regexp_count(lower(col(textCol)), lit(pattern)).cast("long")
        .as("n_hits"))
      .withColumn("blocked", col("n_hits") > maxHits)
  }

  /** [[blocklistFilter]] at dictionary scale: identical output, but the
    * phrases compile into a TRIE walked by a native codegen kernel
    * ([[graft.functions.expressions.PhraseMatchOps]]) instead of an
    * alternation regex — per-character cost independent of phrase
    * COUNT, so a 10⁵-phrase safety dictionary (realistic for a
    * multilingual bad-words + PII-pattern list) scans at the same rate
    * as t39's four. Leftmost-longest non-overlapping word-bounded
    * semantics, equal to the regex face by construction (CurationSpec
    * pins the two faces equal phrase-set-for-phrase-set; the t42
    * oracle still replays the REGEX — the independent twin). */
  def blocklistFilterTrie(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrases: Seq[String],
      maxHits: Long = 0L): DataFrame = {
    require(maxHits >= 0L, s"maxHits must be >= 0, got $maxHits")
    // validate eagerly (the kernel's table builds lazily at execution;
    // a bad dictionary should fail at CALL time like the regex face)
    graft.functions.expressions.PhraseMatchOps.table(phrases)
    docs.select(
      col(idCol),
      graft.functions.expressions.PhraseMatchOps
        .phraseCount(lower(col(textCol)), phrases).as("n_hits"))
      .withColumn("blocked", col("n_hits") > maxHits)
  }

  /** URL canonicalization for dedup keys — the web-curation step that
    * collapses crawl-variant URLs of the same resource before any
    * content hashing: lowercase scheme + host, strip the default port
    * (:80 for http, :443 for https), drop the fragment, strip trailing
    * slashes from the path, drop tracking query params
    * (utm_&#42;, fbclid, gclid, msclkid, ref), and SORT the surviving params
    * (param order is transport noise). Expects absolute http(s) URLs
    * (`scheme://host[:port][/path][?query][#frag]`).
    *
    * Pure `functions` composition — whole-stage codegen'd, zero
    * shuffle, streaming-safe — and every step (split_part-style
    * indexing, anchored regexp, binary-collation array sort) replays
    * exactly in DuckDB for the d23 oracle. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val rest = substring_index(noFrag, "://", -1)
    val base = substring_index(rest, "?", 1)
    val query = when(instr(rest, "?") > 0, substring_index(rest, "?", -1))
      .otherwise(lit(""))
    val hostPort = lower(substring_index(base, "/", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val path = regexp_replace(
      base.substr(length(substring_index(base, "/", 1)) + 1, lit(Int.MaxValue)),
      "/+$", "")
    val params = array_join(
      array_sort(filter(split(query, "&"), p =>
        p =!= "" && !p.rlike("^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)="))),
      "&")
    concat(scheme, lit("://"), host, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }

  /** URL-keyed dedup over [[canonicalizeUrl]]: one keyed aggregation
    * per canonical URL — `n_docs` crawl variants collapsed, keeper =
    * smallest id (deterministic; compose with d13-style quality
    * survivor selection when content quality should pick instead).
    * The canonical key is computed in-scan; raw URLs never shuffle. */
  def urlDedup(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs
      .groupBy(canonicalizeUrl(col(urlCol)).as("canon_url"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keeper_id"))

  /** Preference-pair assembly — the DPO/RLHF reward-data step: from a
    * table of scored candidate responses, emit per prompt group the
    * (chosen, rejected) pair with maximal score separation. `chosen`
    * is the response maximizing (score, id) lexicographically and
    * `rejected` the one minimizing it — the struct min/max total order
    * makes ties deterministic without a second pass. Groups with fewer
    * than two responses, or where every response scores identically
    * (margin 0 — no learning signal), are dropped.
    *
    * Scores should be exact (longs or quantized longs): `margin` is
    * then an exact integer difference and the whole output replays
    * bit-for-bit cross-engine.
    *
    * Scale shape: ONE (prompt) aggregation — two struct min/max
    * accumulators with map-side partials; response text/ids never
    * shuffle beyond the winning structs. At 100 TB this is the same
    * cost as a count per prompt, regardless of responses-per-prompt
    * skew. */
  def preferencePairs(
      responses: DataFrame,
      promptCol: String,
      idCol: String,
      scoreCol: String): DataFrame =
    responses
      .groupBy(col(promptCol))
      .agg(
        count(lit(1)).as("n_responses"),
        max(struct(col(scoreCol).as("score"), col(idCol).as("id"))).as("__c"),
        min(struct(col(scoreCol).as("score"), col(idCol).as("id"))).as("__r"))
      .where(col("n_responses") >= 2 &&
        col("__c.score") > col("__r.score"))
      .select(
        col(promptCol), col("n_responses"),
        col("__c.id").as("chosen_id"),
        col("__c.score").as("chosen_score"),
        col("__r.id").as("rejected_id"),
        col("__r.score").as("rejected_score"),
        (col("__c.score") - col("__r.score")).as("margin"))
}
