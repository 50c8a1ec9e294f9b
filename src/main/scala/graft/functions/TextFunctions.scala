package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline: tokenization,
  * shingles, quality signals, language-ID scoring, fingerprints. All are
  * compositions of built-in codegen'd expressions (split / transform /
  * aggregate / regexp) — no UDFs — so they run inside whole-stage codegen
  * and scale linearly with no shuffle.
  *
  * Beyond the reference's scope (Frames transforms cells with arbitrary
  * Haskell functions, SURVEY §2.8); these are the first-class equivalents
  * a 100 TB corpus engine needs.
  */
object TextFunctions {

  /** Whitespace tokenization (empty tokens removed). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** One-pass character-class counts (native expression) — the shared
    * kernel for token counting and the quality ratios. Identical
    * expressions in one projection are subexpression-eliminated, so
    * stacking several ratios still costs a single pass per row. */
  def textStats(text: Column): Column =
    graft.functions.expressions.TextStats(text)

  /** Token count = maximal non-whitespace runs; equals
    * `size(tokens(text))` without materializing the token array. */
  def tokenCount(text: Column): Column =
    textStats(text).getField("n_tokens").cast("int")

  /** Distinct lowercase tokens — the unigram set for Jaccard. */
  def tokenSet(text: Column): Column = array_distinct(tokens(lower(text)))

  import Hof.bindOnce

  /** Space-joined word n-grams over a token array, scan-local: element
    * i of the result is tokens[i..i+n-1], for every full window. Built
    * from indexed `transform` + `filter`, so it composes into the same
    * scan as the tokenizer — n-gram extraction over a corpus never
    * shuffles, only the downstream count does. The input array is bound
    * once per row (see [[bindOnce]]) so callers may pass a computed
    * column without the per-window re-evaluation trap. */
  def ngrams(ts: Column, n: Int): Column = {
    require(n >= 1, s"need n >= 1; got $n")
    bindOnce(ts) { a =>
      filter(
        transform(a, (_, i) =>
          when(i <= size(a) - n,
            concat_ws(" ", (0 until n).map(j => element_at(a, i + j + 1)): _*))),
        g => g.isNotNull)
    }
  }

  /** GPT-2-style BPE pretokenizer (simplified): contractions, optional
    * leading space + letter runs / digit runs / punctuation runs, then
    * whitespace runs. Deliberately lookahead-free so Java regex and RE2
    * (DuckDB, for the oracle) produce identical token streams. This is
    * the pretokenization step; actual BPE merges are vocabulary-dependent
    * and belong to the model, not the engine — pretoken counts are the
    * standard corpus-size proxy. */
  val bpePattern = "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** k-token shingles: sliding windows of k consecutive tokens joined by a
    * single space, distinct. Native
    * [[graft.functions.expressions.WordShingles]] expression — one pass,
    * no per-window array allocation (the transform/slice/concat_ws HOF
    * composition it replaces dominated the dedup benchmark profile). */
  def wordShingles(text: Column, k: Int): Column =
    graft.functions.expressions.Sketches.wordShingles(tokens(lower(text)), k)

  /** Character n-grams of the lowercased text (for Jaccard / langid).
    * The lowercased text is bound once per row ([[bindOnce]]) — the
    * substring lambda would otherwise re-lowercase the whole document at
    * every position. */
  def charNgrams(text: Column, n: Int): Column =
    bindOnce(lower(text)) { t =>
      array_distinct(
        transform(
          sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
          i => t.substr(i, lit(n))))
    }

  /** Jaccard similarity of two array<string> columns (sets). Native
    * single-pass hash-set expression; identical arithmetic to
    * size(intersect) / (size(a)+size(b)-size(intersect)). */
  def jaccard(a: Column, b: Column): Column =
    graft.functions.expressions.Sketches.jaccardSim(a, b)

  /** Quality signals (heuristics standard in corpus filtering):
    * mean token length, alpha ratio, digit ratio, whitespace ratio. All
    * deterministic arithmetic -> ANSI-SQL-expressible for the oracle. */
  def meanTokenLength(text: Column): Column = {
    val s = textStats(text)
    val nTok = s.getField("n_tokens")
    when(nTok === 0, 0.0).otherwise(
      (s.getField("n_chars") - s.getField("n_ws")).cast("double") / nTok)
  }

  def alphaRatio(text: Column): Column = {
    val s = textStats(text)
    val len = s.getField("n_chars")
    when(len === 0, 0.0).otherwise(
      s.getField("n_alpha").cast("double") / len)
  }

  def digitRatio(text: Column): Column = {
    val s = textStats(text)
    val len = s.getField("n_chars")
    when(len === 0, 0.0).otherwise(
      s.getField("n_digit").cast("double") / len)
  }

  /** Composite quality score in [0,1]: favors alpha-heavy text with
    * mid-length tokens; penalizes digit soup. Deterministic, documented
    * formula so the DuckDB oracle can reproduce it exactly. */
  def qualityScore(text: Column): Column =
    round(
      alphaRatio(text) * 0.6
        + (lit(1.0) - digitRatio(text)) * 0.2
        + least(meanTokenLength(text) / 10.0, lit(1.0)) * 0.2,
      6)

  /** Stopword fraction against a fixed stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val ts = tokens(lower(text))
    val sw = array(stopwords.map(lit): _*)
    val n = size(ts)
    when(n === 0, 0.0).otherwise(
      size(filter(ts, t => array_contains(sw, t))).cast("double") / n)
  }

  /** Language-ID by stopword-profile scoring: score(text, lang) =
    * stopword fraction under each language's profile; pick the argmax
    * (ties -> lexicographically first lang). An n-gram/stopword heuristic,
    * not a model — deterministic and cheap at scale. */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "a", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不", "这", "他"))

  def langScores(text: Column): Column = {
    val entries = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(lit(lang).as("lang"), round(stopwordRatio(text, words), 6).as("score"))
    }
    array(entries: _*)
  }

  // ---- repetition signals (Gopher-style corpus filters) ----

  /** One-pass token frequency stats (native
    * [[graft.functions.expressions.TokenCounts]] kernel): n_tokens,
    * n_distinct, top_count from a single hash-map sweep per row. The two
    * ratios below share one kernel call via subexpression elimination. */
  def tokenFreqStats(text: Column): Column =
    graft.functions.expressions.Sketches.tokenCounts(tokens(lower(text)))

  /** Fraction of tokens that are repeats of an earlier token:
    * 1 - distinct/total. 0 for empty text. */
  def dupTokenRatio(text: Column): Column = {
    val s = tokenFreqStats(text)
    val n = s.getField("n_tokens")
    when(n === 0, 0.0)
      .otherwise(lit(1.0) - s.getField("n_distinct").cast("double") / n)
  }

  /** Fraction of tokens taken by the single most frequent token — the
    * "top n-gram fraction" repetition filter at n=1. One native kernel
    * pass, no sort (the array_sort + run-length aggregate this replaces
    * dominated the t06 bench profile). */
  def topTokenRatio(text: Column): Column = {
    val s = tokenFreqStats(text)
    val n = s.getField("n_tokens")
    when(n === 0, 0.0).otherwise(s.getField("top_count").cast("double") / n)
  }

  /** Fraction of k-token windows that repeat an earlier window:
    * 1 - distinct_windows / total_windows, total = max(n-k+1, 1)
    * (a doc with <= k tokens is its own single window -> ratio 0). */
  def dupShingleRatio(text: Column, k: Int): Column = {
    val n = size(tokens(lower(text)))
    val total = greatest(n - (k - 1), lit(1))
    when(n === 0, 0.0).otherwise(
      lit(1.0) - size(wordShingles(text, k)).cast("double") / total)
  }

  // ---- PII scan / redaction ----
  // Patterns restricted to syntax with identical semantics under Java
  // regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
  // repetition, \b word boundaries — no lookaround, no backrefs.

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phonePattern = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  def piiEmailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(emailPattern), lit(0)))
  def piiIpCount(text: Column): Column =
    size(regexp_extract_all(text, lit(ipv4Pattern), lit(0)))
  def piiPhoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(phonePattern), lit(0)))

  /** Replace every email / IPv4 / phone match with a typed placeholder.
    * Order matters and is fixed: emails first (their domains may contain
    * digits), then IPs, then phones. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** Best language: highest score, ties to first (languages pre-sorted). */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    // array_sort by (-score, lang): comparator returns int
    val best = array_sort(
      scores,
      (l, r) =>
        when(l("score") > r("score"), -1)
          .when(l("score") < r("score"), 1)
          .when(l("lang") < r("lang"), -1)
          .when(l("lang") > r("lang"), 1)
          .otherwise(0))
    element_at(best, 1)("lang")
  }
}
