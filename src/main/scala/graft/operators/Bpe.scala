package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.expressions.BpeOps

/** Vocabulary-driven BPE token counting over a document corpus — the
  * counts a training pipeline budgets by (pretoken counts, t05, are only
  * a proxy). The merge loop itself is
  * [[graft.functions.expressions.BpeTokenCount]]; this operator gives it
  * the scale-correct shape: pretokenize in-scan (regexp, codegen'd),
  * aggregate (doc, pretoken) occurrence counts — map-side combine
  * absorbs within-doc repetition before the one keyed shuffle — and run
  * the O(|merges| x |pretoken|) loop once per aggregated row, never on
  * the raw token stream. One corpus scan, two keyed shuffles, no join
  * (see [[tokenCounts]] for why per-(doc, pretoken) beats a global
  * vocabulary join here).
  */
object Bpe {

  /** Demo vocabulary: ~50 merges over common English sequences with
    * GPT-2-style leading-space symbols, WELL-FORMED by construction
    * (every part is a single char or an earlier output; outputs unique —
    * validated eagerly by [[BpeOps.table]]). Real deployments load a
    * learned merge table; the engine only requires well-formedness. */
  val referenceMerges: Seq[(String, String)] = Seq(
    " " -> "t", // ' t'   (mirrors real GPT-2 learned order: space
    " " -> "a", // ' a'    merges and 'he' precede 'th'/'the')
    "h" -> "e", // he
    "i" -> "n", // in
    "r" -> "e", // re
    "o" -> "n", // on
    " t" -> "he", // ' the'
    "e" -> "r", // er
    " " -> "s", // ' s'
    "a" -> "t", // at
    " " -> "w", // ' w'
    "e" -> "n", // en
    " " -> "o", // ' o'
    "t" -> "he", // the
    "i" -> "t", // it
    "o" -> "u", // ou
    "e" -> "s", // es
    "a" -> "n", // an
    "o" -> "r", // or
    " " -> "c", // ' c'
    "i" -> "s", // is
    "a" -> "r", // ar
    "a" -> "l", // al
    " t" -> "h", // ' th'
    "an" -> "d", // and
    " " -> "f", // ' f'
    " " -> "b", // ' b'
    " " -> "p", // ' p'
    " " -> "m", // ' m'
    " " -> "d", // ' d'
    " " -> "h", // ' h'
    " " -> "l", // ' l'
    " a" -> "n", // ' an'
    " an" -> "d", // ' and'
    "in" -> "g", // ing
    "t" -> "h", // th
    "e" -> "d", // ed
    "it" -> "h", // ith
    " w" -> "ith", // ' with'
    " t" -> "o", // ' to'
    " " -> "is", // ' is'
    " o" -> "f", // ' of'
    "e" -> "l", // el
    "o" -> "m", // om
    " c" -> "om", // ' com'
    "q" -> "u", // qu
    "c" -> "h", // ch
    "s" -> "h", // sh
    " " -> "e", // ' e'
    " " -> "g", // ' g'
    " " -> "n", // ' n'
    " " -> "r", // ' r'
    " " -> "i", // ' i'
    " i" -> "n") // ' in'

  /** Per-document merged-token counts: (idCol, n_bpe_tokens). Documents
    * with no pretokens (empty/null text) count 0. One output row per
    * DISTINCT id — duplicate ids aggregate into one combined count.
    *
    * Plan shape (verified with `graft.Explain t17`): ONE corpus scan,
    * no join — pretokenize + explode_outer in-scan (the outer variant
    * keeps a null-pretoken row for empty documents, so no second
    * id-only scan is needed to restore them), aggregate (doc, pretoken)
    * occurrence counts (map-side combine absorbs within-doc repetition
    * before the one keyed shuffle), apply the merge loop per aggregated
    * row, sum per doc. An earlier draft deduped to a global pretoken
    * vocabulary and joined lengths back; Catalyst cannot share the
    * un-materialized subplan, so that shape re-scanned and re-tokenized
    * the corpus for the vocabulary branch — a second full pass at
    * 100 TB to save microseconds of merge-loop per row. Per-(doc,
    * pretoken) dedup keeps the loop off the raw token stream with no
    * second scan. */
  def tokenCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)] = referenceMerges): DataFrame = {
    BpeOps.table(merges) // fail fast on a malformed vocabulary
    docs
      .select(col(idCol),
        explode_outer(TextFunctions.bpeTokens(col(textCol))).as("__pt"))
      .groupBy(col(idCol), col("__pt"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(sum(
        when(col("__pt").isNotNull,
          col("__n") * BpeOps.bpeMergedCount(col("__pt"), merges))
          .otherwise(lit(0L))).as("n_bpe_tokens"))
  }

  /** LEARN a merge table from a corpus (Sennrich et al. 2016 BPE
    * training, re-expressed distributed): start from the pretoken
    * vocabulary with occurrence counts, and for each round pick the
    * globally most frequent adjacent symbol pair (count desc, then
    * lexicographic (a, b) — a total order, so the learned table is
    * deterministic) and merge it everywhere. Produces a WELL-FORMED
    * table by construction (each part is a char or an earlier output;
    * a pair whose output string was already produced is skipped), so
    * the result feeds [[tokenCounts]] / the t17 oracle directly.
    *
    * Scale shape: the corpus is read ONCE (pretoken count aggregation);
    * the loop then runs entirely on the vocabulary relation —
    * (symbols array, count) per DISTINCT pretoken, cached and
    * re-derived per round by a scan-local fold (the merge pass is a
    * `functions.aggregate` fold inside codegen: merging (a,b) cannot
    * create a new (a,b) occurrence since a+b equals neither part, so
    * one left-to-right fold per round is exact). Per round: one pair
    * count aggregation with a `candidateLimit`-row
    * TakeOrderedAndProject to the driver. Vocabulary never collects;
    * lineage is cut every few rounds.
    *
    * `batchSize` is the jobs-per-merge lever for production vocabulary
    * sizes: with `batchSize = m`, each counting round accepts up to m
    * mutually NON-INTERACTING pairs from the top `candidateLimit`
    * candidates ([[BpeOps.selectBatch]] — pairwise disjoint symbols and
    * outputs, so each accepted count is exact and one fold pass applies
    * the whole batch; the per-round Spark job count is amortized to
    * ~1/m jobs per learned merge — the candidate collect is the ONLY
    * action per round, doubling as the materializer of the previous
    * round's merge pass). A 32k-merge production
    * vocabulary at m = 32 is ~1k rounds, not 32k sequential jobs.
    * `batchSize = 1` (the default) is EXACTLY sequential Sennrich BPE;
    * m > 1 is the standard frequency-batched variant — each accepted
    * pair carries its exact global count at the time its round was
    * counted, but a pair created by an earlier merge of the same batch
    * cannot be picked until the next round (spec-pinned equal to the
    * identically-parameterized driver-side twin
    * [[BpeOps.learnMergesLocal]]). */
  def learnMerges(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2L,
      batchSize: Int = 1,
      candidateLimit: Int = 64,
      checkpointer: Checkpoint = Checkpoint.local): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(candidateLimit >= batchSize,
      s"candidateLimit ($candidateLimit) must be >= batchSize ($batchSize)")
    val spark = docs.sparkSession
    var vocab = docs
      .select(explode(TextFunctions.bpeTokens(col(textCol))).as("__pt"))
      .groupBy(col("__pt"))
      .agg(count(lit(1)).as("__n"))
      .select(
        // split into single characters (code points via regex split)
        filter(split(col("__pt"), ""), c => c =!= "").as("__syms"),
        col("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val learned = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val outputs = scala.collection.mutable.HashSet[String]()
    var cached = vocab
    // previous round's cache, released only after this round's first
    // action has materialized the current one (one action per round:
    // the candidate collect below doubles as the materializer, so no
    // separate count() job runs per round)
    var pending: Option[DataFrame] = None
    var exhausted = false
    var round = 0
    while (learned.size < numMerges && !exhausted) {
      val counted = vocab
        .select(
          explode(
            filter(
              transform(col("__syms"), (x, i) =>
                struct(x.as("a"), try_element_at(col("__syms"), i + 2).as("b"))),
              p => p.getField("b").isNotNull)).as("__p"),
          col("__n"))
        .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
        .agg(sum(col("__n")).as("__c"))
        .filter(col("__c") >= minPairCount)
      // top-candidateLimit sorted candidates to the driver (bounded:
      // TakeOrderedAndProject), then the shared greedy batch selection.
      // Pairs whose output collides with an earlier merge output are
      // dropped DRIVER-SIDE from the collected head, not with an
      // `isin(outputs)` filter in the plan: at a 32k-merge vocabulary
      // that filter is an O(|vocab|)-literal expression in every
      // per-round plan. Collisions are rare, so the head is collected a
      // few rows deeper and re-collected deeper still on the off chance
      // the filtered head came up short while more rows remained —
      // keeping selection EXACTLY the twin's filter-then-take.
      val sortedPairs = counted
        .orderBy(col("__c").desc, col("a").asc, col("b").asc)
      var fetch = candidateLimit + math.min(outputs.size, 64) + 8
      var pairs: Seq[(String, String)] = Seq.empty
      var deepEnough = false
      while (!deepEnough) {
        val head = sortedPairs.limit(fetch).collect()
          .map(r => (r.getString(0), r.getString(1)))
        val surviving = head.filter { case (a, b) => !outputs(a + b) }
        deepEnough = surviving.length >= candidateLimit || head.length < fetch
        if (deepEnough) pairs = surviving.take(candidateLimit).toSeq
        else fetch *= 2
      }
      // the collect above computed every partition of `vocab` (global
      // top-k), so its persist/cut is materialized — the parent cache
      // can go now
      pending.foreach(_.unpersist())
      pending = None
      val accepted = BpeOps.selectBatch(
        pairs, math.min(batchSize, numMerges - learned.size))
      if (accepted.isEmpty) exhausted = true
      else {
        learned ++= accepted
        accepted.foreach { case (a, b) => outputs += (a + b) }
        // the merged vocabulary only feeds the NEXT round's counting —
        // when this batch completes the table, skip deriving it at all
        // (the old shape paid a full merge+materialize job whose output
        // was never read)
        if (learned.size < numMerges) {
          // one exact left-to-right merge pass applying the WHOLE batch,
          // in-scan: fold that appends, or fuses the last element with
          // the current one when (last, current) is an accepted pair —
          // at most one branch can match (outputs/symbols are pairwise
          // disjoint by selectBatch), so a branch chain is exact
          def fuseWith(acc: Column, a: String, b: String): Column =
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b)))
          def hit(acc: Column, x: Column, a: String, b: String): Column =
            size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b)
          val merged = aggregate(
            col("__syms"),
            array().cast("array<string>"),
            (acc, x) => {
              val first = accepted.head
              val chained = accepted.tail.foldLeft(
                when(hit(acc, x, first._1, first._2), fuseWith(acc, first._1, first._2))) {
                case (w, (a, b)) => w.when(hit(acc, x, a, b), fuseWith(acc, a, b))
              }
              chained.otherwise(concat(acc, array(x)))
            })
          val next = vocab.select(merged.as("__syms"), col("__n"))
          // cut lineage every few rounds: each round nests another fold
          // expression; past ~8 the analyzed plan growth dominates. The
          // cut is lazy and the persist is too — the NEXT round's
          // candidate collect materializes it (its global top-k computes
          // every partition), while the parent stays cached until then
          // so nothing recomputes from the scan. Pass Checkpoint.reliable
          // for executor-loss-safe multi-hour learns.
          val mat =
            if (round % 4 == 3) checkpointer.cut(next, eager = false)
            else next.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          pending = Some(cached)
          cached = mat
          vocab = mat
        }
      }
      round += 1
    }
    pending.foreach(_.unpersist())
    cached.unpersist()
    learned.toSeq
  }

  /** Persist a learned merge table as a tiny (rank, a, b) parquet
    * relation — the artifact a learn-once job ([[learnMerges]])
    * publishes and every downstream tokenize job loads, so the
    * expensive training rounds run once per corpus, not once per
    * consumer. Validated BEFORE publishing (a malformed table must not
    * reach the artifact store). One file: the table is vocabulary-sized
    * (kilobytes), and readers collect it to the driver anyway. */
  def writeMerges(
      spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)],
      path: String): Unit = {
    BpeOps.table(merges) // fail fast before publishing
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "a", "b")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[writeMerges]] artifact, restoring rank order and
    * re-validating well-formedness — corruption (reordered ranks, a
    * duplicated output, a part that is neither a char nor an earlier
    * output) fails HERE, at load, not mid-pipeline inside a tokenize
    * job. The result feeds [[tokenCounts]] / [[graft.functions
    * .expressions.BpeOps.bpeEncode]] directly. */
  def readMerges(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] = {
    val loaded = spark.read.parquet(path)
      .select(col("rank").cast("int"), col("a"), col("b"))
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq
    BpeOps.table(loaded) // fail fast on a corrupted artifact
    loaded
  }

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB replay of [[tokenCounts]] as named CTEs (caller appends the
    * final SELECT): produces `bpe_counts(doc_id, n_bpe_tokens)` over
    * `documents`. The encoding is a rank-stepping recursive CTE — state
    * (pretoken, symbol list, rank r); each step merges the LEFTMOST
    * occurrence of merge r, or advances to r+1 when none remains; a row
    * finishes at r = |merges|. One-leftmost-at-a-time equals the Spark
    * side's one-pass-per-rank for a well-formed table (merging (a,b)
    * cannot create another (a,b): a+b equals neither a nor b). */
  def countsSqlCtes(
      merges: Seq[(String, String)] = referenceMerges,
      docsRelation: String = "documents"): String = {
    // An EMPTY learned table is legitimate (degenerate corpus,
    // minPairCount unmet): render a typed empty relation — `VALUES `
    // with no tuples is invalid SQL. The recursion then stops at r = 0
    // and every pretoken keeps its character split, matching
    // tokenCounts under zero merges.
    val mergesRelation =
      if (merges.isEmpty) "SELECT 0 AS r, '' AS a, '' AS b WHERE FALSE"
      else "VALUES " + merges.zipWithIndex
        .map { case ((a, b), r) => s"($r, ${sqlQuote(a)}, ${sqlQuote(b)})" }
        .mkString(", ")
    val pat = "$$" + TextFunctions.bpePattern + "$$"
    s"""bpe_merges(r, a, b) AS ($mergesRelation),
      bpe_doc_pt AS (
        SELECT doc_id, unnest(regexp_extract_all(text, $pat)) AS pt
        FROM $docsRelation),
      bpe_pt_counts AS (
        SELECT doc_id, pt, count(*) AS n FROM bpe_doc_pt GROUP BY doc_id, pt),
      bpe_enc(pt, syms, r) AS (
        SELECT pt,
               list_transform(range(1, length(pt) + 1), i -> substring(pt, i, 1)),
               0
        FROM (SELECT DISTINCT pt FROM bpe_pt_counts)
        UNION ALL
        SELECT pt,
               CASE WHEN pos IS NULL THEN syms
                    ELSE array_slice(syms, 1, pos - 1) || [a || b]
                         || array_slice(syms, pos + 2, len(syms)) END,
               CASE WHEN pos IS NULL THEN r + 1 ELSE r END
        FROM (
          SELECT e.pt, e.syms, e.r, m.a, m.b,
                 list_filter(range(1, len(e.syms)),
                             i -> e.syms[i] = m.a AND e.syms[i + 1] = m.b)[1] AS pos
          FROM bpe_enc e JOIN bpe_merges m ON m.r = e.r)),
      bpe_vocab AS (
        SELECT pt, len(syms) AS n_tok FROM bpe_enc WHERE r = ${merges.length}),
      bpe_counts AS (
        SELECT d.doc_id,
               cast(coalesce(s.nb, 0) as bigint) AS n_bpe_tokens
        FROM $docsRelation d
        LEFT JOIN (
          SELECT c.doc_id, sum(c.n * v.n_tok) AS nb
          FROM bpe_pt_counts c JOIN bpe_vocab v USING (pt)
          GROUP BY c.doc_id) s
        ON d.doc_id = s.doc_id)"""
  }
}
