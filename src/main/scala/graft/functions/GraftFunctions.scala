package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions._

/** SQL registration for graft's native Catalyst expressions, so `spark.sql`
  * users get the same codegen'd kernels as the Column API:
  *
  * {{{
  *   // at session build time (cluster-wide, e.g. spark-defaults):
  *   //   spark.sql.extensions=graft.functions.GraftExtensions
  *   // or on a live session:
  *   GraftFunctions.registerAll(spark)
  *   spark.sql("SELECT text_stats(text).n_tokens FROM docs")
  * }}}
  *
  * Scalar-parameterized expressions (shingle size, histogram bins, …)
  * take foldable integer arguments, resolved at plan time — the SQL form
  * is exactly as static as the Column form.
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = {
    require(e.foldable, s"$name must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$name must be an integer literal, got $other")
    }
  }

  private def longArg(e: Expression, name: String): Long = {
    require(e.foldable, s"$name must be a literal")
    e.eval() match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"$name must be an integer literal, got $other")
    }
  }

  /** Arity guard: a clear error instead of a raw MatchError when a SQL
    * call passes the wrong number of arguments. */
  private def arity(name: String, n: Int)(
      pf: PartialFunction[Seq[Expression], Expression]): Seq[Expression] => Expression =
    args => {
      if (args.length != n)
        throw new IllegalArgumentException(
          s"$name expects $n argument(s), got ${args.length}")
      pf(args)
    }

  /** (name, usage, builder) for every SQL-exposed graft expression. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("rolling_hash",
      "rolling_hash(str) - 64-bit polynomial rolling hash of the UTF-8 bytes",
      arity("rolling_hash", 1)({ case Seq(c) => RollingHash(c) })),
    ("text_stats",
      "text_stats(str) - struct<n_chars,n_alpha,n_digit,n_ws,n_tokens> in one pass",
      arity("text_stats", 1)({ case Seq(c) => TextStats(c) })),
    ("normalize_text",
      "normalize_text(str) - NFC + whitespace/zero-width/punctuation Unicode cleanup",
      arity("normalize_text", 1)({ case Seq(c) => NormalizeText(c) })),
    ("blob_stats",
      "blob_stats(bin) - struct<byte_len,byte_sum,mean_byte,distinct_bytes,entropy>",
      arity("blob_stats", 1)({ case Seq(c) => BlobStats(c) })),
    ("byte_histogram",
      "byte_histogram(bin, bins) - byte-value histogram with `bins` buckets",
      arity("byte_histogram", 2)({ case Seq(c, b) => ByteHistogram(c, intArg(b, "bins")) })),
    ("frame_fingerprints",
      "frame_fingerprints(bin, frameBytes, n) - n evenly spaced window hashes",
      arity("frame_fingerprints", 3)({ case Seq(c, f, n) =>
        FrameFingerprints(c, intArg(f, "frameBytes"), intArg(n, "n")) })),
    ("simhash64",
      "simhash64(array<string>) - 64-bit SimHash of token hashes",
      arity("simhash64", 1)({ case Seq(c) => SimHash64(c) })),
    ("minhash_sig",
      "minhash_sig(array<string>, numHashes, seed) - MinHash signature",
      arity("minhash_sig", 3)({ case Seq(c, n, s) =>
        MinHashSig(c, intArg(n, "numHashes"), longArg(s, "seed")) })),
    ("word_shingles",
      "word_shingles(array<string>, k) - distinct k-token shingles",
      arity("word_shingles", 2)({ case Seq(c, k) => WordShingles(c, intArg(k, "k")) })),
    ("jaccard_sim",
      "jaccard_sim(a, b) - Jaccard similarity of two string arrays",
      arity("jaccard_sim", 2)({ case Seq(a, b) => JaccardSim(a, b) })),
    ("cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two double arrays",
      arity("cosine_sim", 2)({ case Seq(a, b) => CosineSim(a, b) })),
    ("dot_long",
      "dot_long(a, b) - exact integer dot product of two long arrays",
      arity("dot_long", 2)({ case Seq(a, b) => DotLongExpr(a, b) })),
    ("token_counts",
      "token_counts(array<string>) - struct(n_tokens, n_distinct, top_count)",
      arity("token_counts", 1)({ case Seq(c) => TokenCounts(c) })),
    ("hll_distinct",
      "hll_distinct(long) - HyperLogLog approximate distinct count (aggregate)",
      arity("hll_distinct", 1)({ case Seq(c) => HllDistinct(c).toAggregateExpression() })),
    ("hll_sketch",
      "hll_sketch(long) - HyperLogLog register bytes: persistable mergeable distinct-count state (aggregate)",
      arity("hll_sketch", 1)({ case Seq(c) => HllSketch(c).toAggregateExpression() })),
    ("hll_union",
      "hll_union(binary) - union of persisted hll_sketch states (aggregate; idempotent)",
      arity("hll_union", 1)({ case Seq(c) => HllUnion(c).toAggregateExpression() })),
    ("hll_estimate",
      "hll_estimate(binary) - distinct-count estimate from hll_sketch/hll_union bytes",
      arity("hll_estimate", 1)({ case Seq(c) => HllEstimate(c) })),
    ("cms_sketch",
      "cms_sketch(long) - Count-Min frequency sketch, array<long> of DxW counters (aggregate)",
      arity("cms_sketch", 1)({ case Seq(c) => CmsSketch(c).toAggregateExpression() })),
    ("cms_union",
      "cms_union(array<long>) - sum-merge of persisted cms_sketch states (aggregate; NOT replay-idempotent)",
      arity("cms_union", 1)({ case Seq(c) => CmsUnion(c).toAggregateExpression() })),
    ("cms_estimate",
      "cms_estimate(sketch, long) - Count-Min point frequency estimate (est >= exact)",
      arity("cms_estimate", 2)({ case Seq(s, v) => CmsEstimate(s, v) })),
    ("hist_sketch",
      "hist_sketch(long, lo, hi, bins) - fixed-range histogram counters: persistable mergeable quantile state (aggregate)",
      arity("hist_sketch", 4)({ case Seq(c, lo, hi, b) =>
        HistSketch(c, longArg(lo, "lo"), longArg(hi, "hi"), intArg(b, "bins"))
          .toAggregateExpression() })),
    ("hist_union",
      "hist_union(array<long>) - sum-merge of persisted hist_sketch states (aggregate; NOT replay-idempotent)",
      arity("hist_union", 1)({ case Seq(c) => HistUnion(c).toAggregateExpression() })),
    ("hist_quantile",
      "hist_quantile(sketch, q_ppm, lo, hi) - lower bin edge at rank q_ppm*(n-1) div 1e6",
      arity("hist_quantile", 4)({ case Seq(s, q, lo, hi) =>
        HistQuantile(s, q, longArg(lo, "lo"), longArg(hi, "hi")) })),
    ("bloom_agg",
      "bloom_agg(long, numBits, numHashes) - Bloom filter bytes over the group (aggregate)",
      arity("bloom_agg", 3)({ case Seq(c, m, k) =>
        BloomAgg(c, intArg(m, "numBits"), intArg(k, "numHashes")).toAggregateExpression() })),
    ("bloom_union",
      "bloom_union(binary) - OR-merge of persisted bloom_agg filters (aggregate; idempotent)",
      arity("bloom_union", 1)({ case Seq(c) => BloomUnion(c).toAggregateExpression() })),
    ("bloom_might_contain",
      "bloom_might_contain(filterBytes, long, numHashes) - membership probe (no false negatives)",
      arity("bloom_might_contain", 3)({ case Seq(b, v, k) =>
        BloomMightContain(b, v, intArg(k, "numHashes")) })),
    ("bottom_k",
      "bottom_k(long, k) - k values with smallest xxhash64: deterministic consistent sample (aggregate)",
      arity("bottom_k", 2)({ case Seq(c, k) =>
        BottomK(c, intArg(k, "k")).toAggregateExpression() })),
    ("zorder",
      "zorder(bits, c1, c2, ...) - Morton interleave of pre-binned longs for multi-column clustering",
      args => {
        if (args.length < 3)
          throw new IllegalArgumentException(
            s"zorder expects (bits, c1, c2, ...), got ${args.length} argument(s)")
        ZOrderN(args.tail, intArg(args.head, "bits"))
      }))

  /** Register into a live session (idempotent; `createOrReplace`). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerTempFunction(spark, name, builder)
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` entry point:
  * native SQL functions + graft's planner strategies. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.RowIndexStrategy)
    ext.injectOptimizerRule(_ => graft.plans.GlobalRowNumberRule)
    ext.injectOptimizerRule(_ => graft.plans.GlobalRunningSumRule)
  }
}
