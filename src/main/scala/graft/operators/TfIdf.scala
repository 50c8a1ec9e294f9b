package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-wide TF-IDF term weighting — the classic signature-term /
  * keyword-extraction pass of a text pipeline (Salton & Buckley 1988,
  * smooth-idf variant as popularized by scikit-learn:
  * idf = ln((N+1)/(df+1)) + 1).
  *
  * Plan shape at 100 TB: tokenize+explode is scan-local; tf aggregates on
  * (doc, term) with map-side partials; df reuses the tf relation grouped
  * by term (never re-reads the corpus); the tf-df join co-partitions on
  * `term` (df is already shuffled by term from its own aggregation); the
  * corpus size N broadcasts as a 1-row aggregate. Top-k per doc is a
  * row_number window PARTITIONED by doc — plans as WindowGroupLimit
  * (per-partition partial top-k), never a global sort.
  *
  * Determinism: tfidf = tf * (ln((N+1)/(df+1)) + 1) with the division
  * and product correctly rounded IEEE ops in a fixed order; ties in the
  * ranking (identical (tf, df)) break on the term string, so the output
  * is engine-independent (the t08 oracle replays it in DuckDB).
  */
object TfIdf {

  /** Per-document top-`k` terms by TF-IDF: columns
    * (doc_id, rank, term, tf, df, tfidf). `docFilter` optionally
    * restricts the OUTPUT docs (scores stay corpus-wide). */
  def topTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      docFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val toks = docs.select(
      col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfRel, "term")
      .crossJoin(broadcast(n))
      .withColumn(
        "tfidf",
        col("tf").cast("double") *
          (log(
            (col("n_docs").cast("double") + lit(1.0)) /
              (col("df").cast("double") + lit(1.0))) + lit(1.0)))
    val filtered = docFilter.fold(scored)(f => scored.filter(f))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    filtered
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("tfidf"))
  }
}
