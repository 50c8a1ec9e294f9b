package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus retrieval scoring — BM25 top-k over a document table, the
  * ranking step of retrieval-based curation (benchmark decontamination
  * by retrieval, nearest-document audits, RAG index QA).
  *
  * Scale shape: the corpus text never shuffles. Tokenization and the
  * query-term filter run in the scan stage, so the only shuffled
  * relation is (doc_id, dl, term, tf) for MATCHING terms — bounded by
  * |query| × matching docs. Document frequencies and corpus stats are
  * tiny aggregates broadcast back; the final top-k plans as
  * TakeOrderedAndProject (per-partition heaps, no global sort).
  *
  * Determinism (cross-engine exactness): this is the "rational idf"
  * BM25 variant — idf = (N - df + 0.5) / (df + 0.5), i.e. the classic
  * formula without the log, which is monotone in it and keeps the
  * whole score inside IEEE double +,*,/ (no transcendental whose
  * last-ulp differs between runtimes). Per-document summation adds the
  * per-term partial scores in the FIXED query-term order (each term's
  * group-sum has exactly one nonzero addend, and x + 0.0 is exact), so
  * the result is bit-identical regardless of partitioning — the same
  * discipline as Aggregates.sumExact, achieved without rounding.
  */
object Retrieval {

  /** Top-k documents by BM25 against `queryTerms` (lowercased match).
    * Output: (idCol, score), score descending, ties broken by id.
    * Documents matching no query term score 0 and are not returned. */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms,
      "queryTerms must be non-empty and distinct")
    val toks = docs.select(
      col(idCol),
      TextFunctions.tokens(lower(col(textCol))).as("__ts"))
    val dls = toks.select(
      col(idCol), size(col("__ts")).cast("long").as("dl"), col("__ts"))
    val stats = dls.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = dls
      .select(col(idCol), col("dl"), explode(col("__ts")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val s = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
    val scored = tf
      .join(broadcast(dfRel), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__s", s)
    val termSums = queryTerms.map(t =>
      sum(when(col("term") === t, col("__s")).otherwise(lit(0.0))).as(s"__s_$t"))
    scored
      .groupBy(col(idCol))
      .agg(termSums.head, termSums.tail: _*)
      .select(
        col(idCol),
        queryTerms.map(t => col(s"__s_$t")).reduce(_ + _).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** RECIPROCAL-RANK FUSION (Cormack, Clarke & Buettcher SIGIR 2009):
    * merge N ranked lists — classically a lexical (BM25) and a dense
    * (embedding kNN) retriever, the standard "hybrid search" pair —
    * into one ranking by summing 1/(k0 + rank) per item. Rank-based,
    * so no score calibration across retrievers is needed (the reason
    * RRF is the production default for hybrid retrieval).
    *
    * Each input carries `keyCols` (e.g. query_id), `idCol`, `rankCol`
    * (1-based). Contributions are QUANTIZED — round(scale/(k0+rank))
    * as a long — so the fused score is an exact integer sum:
    * associative, partitioning-independent, bit-identical in an oracle
    * replay (the [[graft.operators.Graph]] discipline). `n_lists`
    * reports how many retrievers surfaced each item — the agreement
    * signal hybrid pipelines threshold on.
    *
    * Scale shape: inputs are top-k lists, already bounded per key; the
    * fusion is one union + one (keys, id) keyed long aggregation with
    * map-side partials + one per-key WindowGroupLimit top-k. Nothing
    * here touches the corpus — fusion cost is |queries| × k × N rows
    * regardless of corpus size. */
  def rrfFusion(
      lists: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      k: Int,
      keyCols: Seq[String],
      k0: Int = 60,
      scale: Long = 1000000000000L): DataFrame = {
    require(lists.nonEmpty && k > 0 && k0 > 0 && scale > 0,
      s"bad rrf params: lists=${lists.size} k=$k k0=$k0 scale=$scale")
    require(keyCols.nonEmpty,
      "rrfFusion needs at least one key column (e.g. a query id) — " +
      "a keyless fusion would need an unpartitioned top-k window")
    val cols = keyCols.map(col) :+ col(idCol) :+ col(rankCol).cast("long").as("__r")
    val contrib =
      round(lit(scale).cast("double") / (lit(k0.toLong) + col("__r")), 0)
        .cast("long")
    val fused = lists.map(_.select(cols: _*)).reduce(_ unionByName _)
      .select(keyCols.map(col) :+ col(idCol) :+ contrib.as("__c"): _*)
      .groupBy(keyCols.map(col) :+ col(idCol): _*)
      .agg(sum(col("__c")).as("rrf"), count(lit(1)).as("n_lists"))
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("rrf").desc, col(idCol).asc)
    fused
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(keyCols.map(col) ++ Seq(col("rank"), col(idCol), col("rrf"),
        col("n_lists")): _*)
  }

  /** RANKING METRICS — the retrieval-evaluation face: per-query MRR,
    * precision@k, and nDCG@k over any ranked result list with a 0/1
    * relevance column (how every retriever/index/fusion configuration
    * here — BM25, dense kNN, IVF probes, RRF — gets placed on a
    * quality curve before it ships; the quality sibling of
    * [[graft.operators.Similarity.annRecallCurve]]'s cost curve).
    *
    * Cross-engine determinism: the discount weights 1/log2(rank+1)
    * exist only for ranks 1..k, so they are embedded as DOUBLE
    * LITERALS (shortest round-trip rendering — both engines parse the
    * identical doubles; no runtime log whose last ulp could differ),
    * DCG folds them in ascending-rank order (fixed-order summation,
    * the t12 discipline), and ideal DCG is the PREFIX-SUM literal of
    * those same weights indexed by the relevant count. MRR is one
    * division by the first relevant rank. Everything rounds at 6dp
    * over the ulp.
    *
    * Scale shape: inputs are top-k lists — k rows per query; one
    * (query) keyed aggregation producing scalars. Corpus-size-free. */
  def rankingMetrics(
      ranked: DataFrame,
      queryCol: String,
      rankCol: String,
      relCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = (1 to k).map(r => math.log(2.0) / math.log(r + 1.0))
    val prefix = w.scanLeft(0.0)(_ + _).tail // idealDCG for 1..k relevant
    val wArr = array(w.map(lit): _*)
    val pArr = array(prefix.map(lit): _*)
    val rows = ranked.select(
      col(queryCol).as("query_id"),
      col(rankCol).cast("int").as("__r"),
      col(relCol).cast("long").as("__rel"))
    rows
      .filter(col("__r") <= k)
      .groupBy(col("query_id"))
      .agg(
        sum(col("__rel")).as("n_rel"),
        min(when(col("__rel") === 1L, col("__r"))).as("__first"),
        sort_array(collect_list(struct(col("__r"), col("__rel"))))
          .as("__byRank"))
      .select(
        col("query_id"),
        col("n_rel"),
        round(coalesce(
          lit(1.0) / col("__first").cast("double"), lit(0.0)), 6).as("mrr"),
        round(col("n_rel").cast("double") / lit(k.toDouble), 6)
          .as(s"precision_at_$k"),
        round(
          when(col("n_rel") === 0L, lit(0.0)).otherwise(
            aggregate(col("__byRank"), lit(0.0),
              (acc, x) =>
                acc + x.getField("__rel").cast("double") *
                  element_at(wArr, x.getField("__r"))) /
            element_at(pArr, col("n_rel").cast("int"))), 6)
          .as(s"ndcg_at_$k"))
  }

  /** Distributed inverted-index build — the MapReduce canonical made
    * Spark-declarative. One row per term: document frequency `df`,
    * collection frequency `cf` (both over the FULL corpus), and
    * `postings` — the first `maxPostings` (doc_id, tf) entries in
    * ascending doc order, serialized `"doc:tf,doc:tf,..."`. Terms with
    * df below `minDf` are dropped after stats are computed.
    *
    * Scale shape: tokenization + explode stay in the scan stage; the
    * (term, doc) term-frequency aggregation map-side combines before
    * its one keyed shuffle, and everything downstream (full-corpus
    * stats, the posting cap, the list build) is keyed by term — the
    * cap is a row_number window PARTITIONED by term that Spark plans
    * as WindowGroupLimit (per-partition top-k heaps, so a stopword's
    * millions of postings never collect anywhere), and the stats/
    * postings join is co-partitioned on the same key. Text never
    * shuffles; no global sort, no unpartitioned window. */
  def invertedIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Long = 1L,
      maxPostings: Int = 1000): DataFrame = {
    require(maxPostings > 0, s"maxPostings must be positive, got $maxPostings")
    // The id keeps its NATIVE type end-to-end: a cast("long") here would
    // silently null out non-numeric doc ids, collapsing all such docs
    // into one null doc and emitting "null:tf" postings. The posting
    // serialization below only needs string concat, and the ascending
    // doc order is the id type's own ordering (numeric for numeric ids,
    // lexicographic for strings).
    val tf = docs
      .select(col(idCol).as("__doc"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("term"), col("__doc"))
      .agg(count(lit(1)).as("__tf"))
    val stats = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("__tf")).as("cf"))
    val capped = tf
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("term")).orderBy(col("__doc").asc)))
      .filter(col("__rn") <= maxPostings)
    val postings = capped.groupBy(col("term")).agg(
      concat_ws(",",
        transform(
          array_sort(collect_list(struct(col("__doc"), col("__tf")))),
          e => concat(e.getField("__doc"), lit(":"), e.getField("__tf"))))
        .as("postings"))
    stats
      .join(postings, Seq("term"))
      .filter(col("df") >= minDf)
      .select(col("term"), col("df"), col("cf"), col("postings"))
  }
}
