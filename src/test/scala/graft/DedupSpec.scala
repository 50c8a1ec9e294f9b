package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Ground-truth tests for the LSH dedup operators: plant known near-dups
  * and assert they are recalled; plant unrelated rows and assert they are
  * not falsely paired (at verified thresholds). */
class DedupSpec extends SparkSpec {

  import spark.implicits._

  private val baseText =
    "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "under the warm sun near the old stone bridge by the river bank"

  // doc 1 = near-dup of 0 (one word changed); doc 2 = unrelated
  private lazy val docs = Seq(
    (0L, baseText),
    (1L, baseText.replace("cat", "kitten")),
    (2L, "completely different content about spark catalyst optimizer " +
      "rules and whole stage code generation for tungsten execution"),
    (3L, baseText.replace("dog", "hound").replace("sun", "moon")))
    .toDF("doc_id", "text")

  test("exact dedup keeps one survivor per key with dup counts") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "k")
    val got = Dedup.exact(df, Seq("k"), "id").orderBy("id").collect()
    assert(got.map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_dups"))).toSeq ==
      Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH recalls planted near-dups, not the unrelated doc") {
    val pairs = Dedup
      .minhashPairs(docs, "doc_id", "text", shingleSize = 3, numHashes = 64, bands = 16)
      .filter(col("jaccard") >= 0.4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((0L, 1L)), "one-word-changed near-dup must be recalled")
    assert(pairs.contains((0L, 3L)), "two-word-changed near-dup must be recalled")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), "unrelated doc must not pair")
  }

  test("simhash of identical text is identical; near-dup within hamming 8") {
    val sh = docs
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(1L)) <= 8)
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(2L)) > 8)
    val pairs = Dedup
      .simhashPairs(docs, "doc_id", "text", maxHamming = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("connectedComponents: chain and isolated pair form min-id clusters") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L), got)
  }

  test("duplicateWeights: 1/|cluster| mass, singletons keep 1.0, cluster mass sums to 1") {
    import spark.implicits._
    val docs = (1L to 6L).toDF("doc_id")
    val comps = Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b"))
    val got = Dedup.duplicateWeights(docs, comps, "doc_id")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) == (1L, 3L, 0.333333))
    assert(got(2L) == (1L, 3L, 0.333333))
    assert(got(3L) == (1L, 3L, 0.333333))
    assert(got(4L) == (4L, 1L, 1.0)) // unclustered: self-rep, full weight
    assert(got(5L) == (5L, 2L, 0.5))
    assert(got(6L) == (5L, 2L, 0.5))
    // every cluster contributes ~unit mass to the reweighted corpus
    got.values.groupBy(_._1).foreach { case (_, ms) =>
      assert(math.abs(ms.map(_._3).sum - 1.0) < 1e-5)
    }
  }

  test("connectedComponents of an empty pair set is empty") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(pairs).isEmpty)
  }

  test("mergeComponents == full CC on randomized graphs under any old/new split") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def comps(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (trial <- 1 to 5) {
      val n = 30
      val edges = Seq.fill(40)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val (oldE, newE) = edges.splitAt(rnd.nextInt(edges.size + 1))
      val full = comps(Dedup.connectedComponents(edges.toDF("id_a", "id_b")))
      val oldC = Dedup.connectedComponents(oldE.toDF("id_a", "id_b"))
      val merged = comps(Dedup.mergeComponents(oldC, newE.toDF("id_a", "id_b")))
      // nodes only in dropped old-singleton positions cannot occur: every
      // old component has >= 2 members, so stars retain all old nodes
      assert(merged == full, s"trial $trial: merged != full CC")
    }
  }

  test("mergeComponents with no new pairs reproduces the old components") {
    import spark.implicits._
    val oldC = Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b"))
    val merged = Dedup.mergeComponents(
      oldC, Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(merged == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
    // and a bridging pair MERGES two old components
    val bridged = Dedup.mergeComponents(
      oldC, Seq((3L, 7L)).toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bridged == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 9L -> 1L))
  }

  test("ngram jaccard pairs finds the planted pair within its block") {
    val blocked = docs.withColumn("lang", lit("en"))
    val pairs = Dedup
      .ngramJaccardPairs(blocked, "doc_id", "text", "lang", threshold = 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("blocked jaccard delegates to the prefix filter: equals brute force within blocks") {
    import graft.functions.TextFunctions
    // two blocks; the delegation to the prefix-filter engine must keep
    // exact same-block recall AND emit no cross-block pair
    val blocked = docs.withColumn("lang",
      when(col("doc_id") % 2 === 0, lit("en")).otherwise(lit("fr")))
    val got = Dedup
      .ngramJaccardPairs(blocked, "doc_id", "text", "lang", threshold = 0.3)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard")))
      .toSet
    val sets = blocked.select(
      col("doc_id"), col("lang"), TextFunctions.tokenSet(col("text")).as("s"))
    val brute = sets.select(col("doc_id").as("id_a"), col("lang").as("la"), col("s").as("sa"))
      .crossJoin(sets.select(col("doc_id").as("id_b"), col("lang").as("lb"), col("s").as("sb")))
      .filter(col("id_a") < col("id_b") && col("la") === col("lb"))
      .withColumn("jaccard", round(TextFunctions.jaccard(col("sa"), col("sb")), 6))
      .filter(col("jaccard") >= 0.3)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard")))
      .toSet
    assert(got == brute)
  }

  test("simhash block indexes are exact vs brute-force hamming (r=3 and r=8)") {
    val sh = docs
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    for (r <- Seq(3, 8)) {
      val got = Dedup
        .simhashPairs(docs, "doc_id", "text", maxHamming = r)
        .collect()
        .map(x => (x.getLong(0), x.getLong(1)))
        .toSet
      val brute = (for {
        (ia, ha) <- sh; (ib, hb) <- sh
        if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= r
      } yield (ia, ib)).toSet
      assert(got == brute, s"simhashPairs(r=$r) must equal brute force")
    }
  }

  test("prefix-filter jaccard join equals brute-force all-pairs exactly") {
    import graft.functions.TextFunctions
    val got = Dedup
      .jaccardSimilarityJoin(docs, "doc_id", "text", threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard")))
      .toSet
    val sets = docs.select(col("doc_id"), TextFunctions.tokenSet(col("text")).as("s"))
    val brute = sets.select(col("doc_id").as("id_a"), col("s").as("sa"))
      .crossJoin(sets.select(col("doc_id").as("id_b"), col("s").as("sb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", round(TextFunctions.jaccard(col("sa"), col("sb")), 6))
      .filter(col("jaccard") >= 0.5)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard")))
      .toSet
    assert(got == brute)
    assert(got.nonEmpty, "planted near-dups must qualify at 0.5")
  }

  test("embedding LSH recalls a planted high-cosine pair") {
    val dim = 16
    val v = (0 until dim).map(i => math.sin(i + 1).toFloat)
    val vNear = v.updated(0, v(0) + 0.01f) // cosine ~ 1
    val vFar = (0 until dim).map(i => math.cos(3 * i + 2).toFloat)
    val emb = Seq((0L, v), (1L, vNear), (2L, vFar))
      .toDF("vec_id", "embedding")
    val pairs = Dedup
      .embeddingNearDupPairs(emb, "vec_id", "embedding", dim = dim, threshold = 0.98)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("autoPlanes: clamped integer log2 of corpus/bucket, monotone") {
    import Dedup.autoPlanes
    // the gate SFs sit at the minP floor (sf0.01=500, sf0.1=2000)
    assert(autoPlanes(0L) == 6 && autoPlanes(500L) == 6 &&
      autoPlanes(2000L) == 6)
    // exact boundary: 64 * 2^6 = 4096 still 6; one more row widens
    assert(autoPlanes(4096L) == 6 && autoPlanes(4097L) == 7)
    // the sf1 corpus (20k vectors): 64 * 2^9 = 32768 >= 20000
    assert(autoPlanes(20000L) == 9)
    // cap: a corpus past 64 * 2^16 saturates at maxP, never overflows
    assert(autoPlanes(10_000_000L) == 16 && autoPlanes(Long.MaxValue / 2) == 16)
    // monotone non-decreasing in n (bucket occupancy never regrows)
    val ps = Seq(1L, 100L, 5000L, 50000L, 500000L, 5000000L).map(autoPlanes(_))
    assert(ps == ps.sorted)
    // custom operating points honor their own clamp
    assert(autoPlanes(1L << 40, targetBucket = 1024L, minP = 4, maxP = 30) == 30)
    // overflow regression: targetBucket * 2^k used to wrap negative for
    // permitted params (maxP up to 62), falling through to maxP even
    // though k=1 suffices — ceil-division must find the true smallest k
    assert(autoPlanes(
      (1L << 62) + 1L, targetBucket = 1L << 62, minP = 1, maxP = 62) == 1)
    assert(autoPlanes(
      Long.MaxValue, targetBucket = 1L << 40, minP = 1, maxP = 62) == 23)
  }

  test("embedding decontamination recalls planted cross-corpus leakage only") {
    val dim = 16
    val v = (0 until dim).map(i => math.sin(i + 1).toFloat)
    val vNear = v.updated(0, v(0) + 0.01f) // the leaked eval item
    val vFar = (0 until dim).map(i => math.cos(3 * i + 2).toFloat)
    val train = Seq((100L, v), (101L, vFar)).toDF("vec_id", "embedding")
    val eval = Seq((200L, vNear), (201L, vFar.map(-_))).toDF("vec_id", "embedding")
    val got = Dedup
      .embeddingDecontaminate(train, eval, "vec_id", "embedding",
        dim = dim, threshold = 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // only the planted train->eval pair; never train-train or eval-eval
    assert(got == Set((100L, 200L)))
  }

  test("IVF knn reaches >=60% recall vs brute force on real embeddings") {
    val emb = Tables(spark, sf0001).embeddings
    val queries = emb.filter(col("vec_id") < 10)
    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = resultSet(
      Similarity.bruteForceKnn(emb, queries, "vec_id", "embedding", k = 5))
    val centroids = Similarity.sampleCentroids(emb, "vec_id", "embedding", nCells = 16)
    val approx = resultSet(
      Similarity.ivfKnn(emb, queries, "vec_id", "embedding", k = 5, centroids, nProbe = 6))
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall below 0.6")
  }

  test("random projection: deterministic, linear on the grid, useful recall") {
    val emb = Tables(spark, sf0001).embeddings
    def proj(df: org.apache.spark.sql.DataFrame, out: Int) =
      Similarity.randomProjection(df, "vec_id", "embedding",
        inDims = 64, outDims = out)
    // partitioning-independent, bit-identical
    val once = proj(emb, 16).collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    val again = proj(emb.repartition(7), 16).collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(once == again)
    // Angle preservation where it matters: plant near-duplicate pairs
    // among unrelated vectors; projected-space top-1 must recover the
    // planted partner. (Raw kNN recall on near-random embeddings is not
    // a JL property — when all cosines tie near zero, no projection can
    // preserve their ordering.)
    val dim = 64
    def base(s: Int) = (0 until dim).map(i => math.sin(s * 97 + i * 31 + 1).toFloat)
    val planted = (0 until 20).flatMap { s =>
      val v = base(s)
      Seq((s.toLong * 2, v), (s.toLong * 2 + 1, v.updated(s % dim, v(s % dim) + 0.05f)))
    }
    val corpus = planted.toDF("vec_id", "embedding")
    val p16 = proj(corpus, 16)
      .select(col("vec_id"), col("proj").cast("array<float>").as("embedding"))
    val top1 = Similarity
      .bruteForceKnn(p16, p16.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", k = 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
    val hit = top1.count { case (q, n) => n == q + 1 }
    assert(hit >= 18, s"only $hit/20 planted near-dups recovered in 16-dim projection")
  }

  test("int8-quantized knn reaches >=80% recall vs float brute force") {
    val emb = Tables(spark, sf0001).embeddings
    val queries = emb.filter(col("vec_id") < 10)
    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = resultSet(
      Similarity.bruteForceKnn(emb, queries, "vec_id", "embedding", k = 5))
    val quant = resultSet(
      Similarity.quantizedKnn(emb, queries, "vec_id", "embedding", k = 5))
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 quantization recall $recall below 0.8")
  }

  test("chunkExactDedup keeps only the first global occurrence of a chunk") {
    // 4-token chunks: doc 10 = [A B], doc 20 = [B C] (B repeats doc 10's
    // second chunk), doc 30 = [A] (repeats doc 10's first chunk), doc 40
    // empty.
    val a = "alpha beta gamma delta"
    val b = "epsilon zeta eta theta"
    val c = "iota kappa lambda mu"
    val df = Seq(
      (10L, s"$a $b"), (20L, s"$b $c"), (30L, a), (40L, ""))
      .toDF("doc_id", "text")
    val got = Dedup
      .chunkExactDedup(df, "doc_id", "text", chunkTokens = 4)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got == Seq(
      (10L, 2L, 2L, s"$a $b"), // first occurrence of both chunks
      (20L, 2L, 1L, c),        // B already seen in doc 10
      (30L, 1L, 0L, ""),       // A already seen in doc 10
      (40L, 0L, 0L, "")))      // empty doc: zero chunks
  }

  test("chunkExactDedup prefers the earliest (id, pos) occurrence within one doc") {
    // one doc whose two chunks are identical: position 0 wins, 1 dropped
    val df = Seq((1L, "x y x y")).toDF("doc_id", "text")
    val got = Dedup
      .chunkExactDedup(df, "doc_id", "text", chunkTokens = 2)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq((2L, 1L, "x y")))
  }

  test("chunkExactDedup hashShuffle mode equals the text-keyed mode on real data") {
    val docsReal = spark.read.parquet(s"$sf0001/documents.parquet")
    def rows(hash: Boolean) = Dedup
      .chunkExactDedup(docsReal, "doc_id", "text", chunkTokens = 10, hashShuffle = hash)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val plain = rows(hash = false)
    val hashed = rows(hash = true)
    assert(plain == hashed)
    // non-vacuous: the corpus must actually contain repeated chunks
    assert(plain.exists(r => r._2 != r._3), "no duplicate chunks — vacuous")
  }

  test("duplicatedSpans: repeats merge into maximal spans, gaps split, empty doc zeros") {
    // L=2. docs 1/2 share their first two windows (one merged span each);
    // doc 3 repeats internally (z z at p=0,1 — whole doc covered); doc 4
    // is empty; doc 6 repeats (a b) at both ENDS with a > L gap between —
    // two separate spans.
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "a b c x y"),
      (3L, "z z z"),
      (4L, ""),
      (6L, "a b m n o p a b"))
      .toDF("doc_id", "text")
    val got = Dedup
      .duplicatedSpans(df, "doc_id", "text", windowTokens = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == Seq(
      (1L, 5L, 4L, 2L, 1L, 3L),
      (2L, 5L, 4L, 2L, 1L, 3L),
      (3L, 3L, 2L, 2L, 1L, 3L),
      (4L, 0L, 0L, 0L, 0L, 0L),
      (6L, 8L, 7L, 2L, 2L, 4L)))
  }

  test("duplicatedSpans invariants hold and are non-vacuous on real data") {
    val docsReal = spark.read.parquet(s"$sf0001/documents.parquet")
    val rows = Dedup
      .duplicatedSpans(docsReal, "doc_id", "text", windowTokens = 8)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length == docsReal.count())
    rows.foreach { case (nt, nw, nd, ns, dt) =>
      assert(nd <= nw && dt <= nt && ns <= nd, s"invariant: $nt $nw $nd $ns $dt")
      assert((ns == 0) == (nd == 0))
      // each span covers at least L tokens and spans can't cover more
      // tokens than (dup windows) + L - 1 each contributes
      if (ns > 0) assert(dt >= ns * 8 - (ns - 1) * 7)
    }
    assert(rows.exists(_._3 > 0), "no duplicated windows in corpus — vacuous")
  }

  test("removeDuplicatedSpans cuts repeats, keeps the first owner, rounds to spans") {
    // L=2, same fixture as the profile test. Doc 1 owns every shared
    // window (lowest id) — untouched. Doc 2's first two windows repeat
    // doc 1 → span [0,2] cuts "a b c" (including the c that unique
    // windows (c x)/(x y) touch — span-boundary rounding, pinned). Doc 3
    // repeats internally: p0 survives as owner, p1 cut → "z". Doc 6's
    // (a b) at both ends repeats doc 1 → two spans cut both ends.
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "a b c x y"),
      (3L, "z z z"),
      (4L, ""),
      (6L, "a b m n o p a b"))
      .toDF("doc_id", "text")
    val got = Dedup
      .removeDuplicatedSpans(df, "doc_id", "text", windowTokens = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got == Seq(
      (1L, 5L, 0L, "a b c d e"),
      (2L, 5L, 3L, "x y"),
      (3L, 3L, 2L, "z"),
      (4L, 0L, 0L, ""),
      (6L, 8L, 4L, "m n o p")))
  }

  test("removeDuplicatedSpans output is a subsequence; removal matches the d16 profile") {
    val docsReal = spark.read.parquet(s"$sf0001/documents.parquet")
    val removed = Dedup
      .removeDuplicatedSpans(docsReal, "doc_id", "text", windowTokens = 8)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val orig = docsReal.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toMap
    removed.foreach { case (id, (nt, nr, txt)) =>
      val keptToks = txt.split("\\s+").filter(_.nonEmpty)
      assert(nr >= 0 && nr <= nt)
      assert(keptToks.length == nt - nr)
      // kept tokens are a subsequence of the original token stream
      var rest = orig(id).split("\\s+").filter(_.nonEmpty).toList
      keptToks.foreach { t =>
        rest = rest.dropWhile(_ != t)
        assert(rest.nonEmpty, s"doc $id: '$t' not in order in original")
        rest = rest.tail
      }
    }
    assert(removed.values.exists(_._2 > 0), "nothing removed — vacuous")
    // a doc with no duplicated windows in the d16 profile loses nothing
    val profile = Dedup
      .duplicatedSpans(docsReal, "doc_id", "text", windowTokens = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)))
      .toMap
    profile.foreach { case (id, nDup) =>
      if (nDup == 0) assert(removed(id)._2 == 0, s"doc $id: removal without repeats")
    }
  }

  test("removeCrossCorpusSpans cuts train-leaked spans from eval, nothing else") {
    val corpus = Seq((1L, "a b c d"), (2L, "p q")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "x a b y"),     // one leaked window mid-doc
      (11L, "p q r s t"),   // leaked prefix
      (12L, "u v w"),       // clean
      (13L, ""),            // empty
      (14L, "a b c d"),     // fully contained in train -> fully cut
      (15L, "m n m n"))     // INTERNAL repeat only: not cross-corpus, kept
      .toDF("doc_id", "text")
    val got = Dedup
      .removeCrossCorpusSpans(corpus, eval, "doc_id", "text", windowTokens = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got == Seq(
      (10L, 4L, 2L, "x y"),
      (11L, 5L, 2L, "r s t"),
      (12L, 3L, 0L, "u v w"),
      (13L, 0L, 0L, ""),
      (14L, 4L, 4L, ""),
      (15L, 4L, 0L, "m n m n")))
  }

  test("crossCorpusOverlap counts distinct shared shingles per (train, eval) pair") {
    val train = Seq(
      (1L, "one two three four"),     // shingles: {one two three, two three four}
      (2L, "five six seven"))         // {five six seven}
      .toDF("doc_id", "text")
    val eval = Seq(
      (100L, "one two three nine"),   // shares "one two three" with train 1
      (200L, "totally different words here")) // shares nothing
      .toDF("doc_id", "text")
    val got = Dedup
      .crossCorpusOverlap(train, eval, "doc_id", "text", shingleSize = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set((1L, 100L, 1L)))
  }

  test("incrementalDedup classifies exact before near, else novel") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the dog"),
      (2L, "completely unrelated corpus text body"),
      (3L, "THE QUICK  brown fox jumps over the dog")) // norm-equal to 1
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "  the quick brown FOX jumps over the dog "), // exact (normalized) → 1
      (20L, "the quick brown fox jumps over the cat"),    // near of 1 (7/9 shingles)
      (30L, "nothing like anything in the corpus at all"))
      .toDF("doc_id", "text")
    val got = Dedup
      .incrementalDedup(corpus, batch, "doc_id", "text", tau = 0.4)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    assert(got == Set(
      (10L, "exact_dup", 1L),
      (20L, "near_dup", 1L),
      (30L, "novel", -1L)))
  }

  test("contaminationReport: overlap fraction + >= threshold flag") {
    val train = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    // shingles of train: {a b c, b c d, c d e}
    val eval = Seq(
      (10L, "a b c d e"), // all 3 shingles seen → 1.0, flagged
      (20L, "x y z w"),   // {x y z, y z w} disjoint → 0.0
      (30L, "a b c z"),   // {a b c, b c z} → 1/2 = threshold → flagged (>=)
      (40L, "b c d"),     // short doc: ONE whole-text shingle, seen → 1.0
      (50L, "")           // empty text: excluded entirely
    ).toDF("doc_id", "text")
    val got = Dedup
      .contaminationReport(train, eval, "doc_id", "text",
        shingleSize = 3, threshold = 0.5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got == Map(
      10L -> ((3L, 3L, 1.0, true)),
      20L -> ((2L, 0L, 0.0, false)),
      30L -> ((2L, 1L, 0.5, true)),
      40L -> ((1L, 1L, 1.0, true))))
  }

  test("contaminationReport rejects a threshold outside [0,1]") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Dedup.contaminationReport(df, df, "doc_id", "text", threshold = 1.5))
  }

  test("lshRecallCurve: monotone on nested budgets, consistent with minhashPairs") {
    val docs = Tables(spark, sf0001).documents
    val rows = Dedup
      .lshRecallCurve(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bandCounts = Seq(4, 8, 16), tau = 0.4)
      .orderBy(col("bands"))
      .collect()
      .map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"),
        r.getAs[Long]("true_pairs"), r.getAs[Long]("found_pairs"),
        r.getAs[Double]("recall"), r.getAs[Long]("candidate_pairs"),
        r.getAs[Double]("precision")))
    assert(rows.map(_._1).toSeq == Seq(4, 8, 16))
    assert(rows.map(_._2).toSeq == Seq(16, 8, 4))
    val truePairs = rows.head._3
    assert(rows.forall(_._3 == truePairs), "true_pairs must be budget-independent")
    rows.foreach { case (b, _, t, f, rec, cand, prec) =>
      assert(f <= t, s"bands=$b found=$f > true=$t")
      assert(f <= cand, s"bands=$b found=$f > candidates=$cand")
      assert(math.abs(rec - f.toDouble / t) < 1e-6, s"bands=$b recall mismatch")
      assert(math.abs(prec - f.toDouble / cand) < 1e-6,
        s"bands=$b precision mismatch")
    }
    // candidates also monotone on nested budgets (the superset property)
    assert(rows.map(_._6).toSeq == rows.map(_._6).toSeq.sorted,
      s"candidate_pairs not monotone: ${rows.map(_._6).toSeq}")
    // nested boundaries (4 | 8 | 16 over 64 hashes): a 16-row band match
    // is two aligned 8-row matches, so candidates only grow with bands
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted,
      s"found_pairs not monotone: ${rows.map(_._4).toSeq}")
    // the bands=16 configuration is exactly d03's: every verified
    // >= tau pair minhashPairs surfaces must be counted as found
    val d03Found = Dedup
      .minhashPairs(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16)
      .filter(col("jaccard") >= 0.4)
      .count()
    assert(rows.last._4 == d03Found,
      s"bands=16 found=${rows.last._4} != minhashPairs verified count $d03Found")
  }

  test("editVerifiedPairs: revision passes, clause-shuffled text fails the edit gate") {
    // doc 10 = one-word revision of 0 (high Jaccard AND high edit sim);
    // doc 11 = the same words with the two halves swapped — shingle
    // Jaccard stays high (same shingle set minus the seam) but the edit
    // ratio collapses, which is exactly the case d20 exists to separate
    val half = baseText.length / 2
    val shuffled = (baseText.substring(half).trim + " " +
      baseText.substring(0, half).trim)
    val revDocs = Seq(
      (0L, baseText),
      (10L, baseText.replace("cat", "kitten")),
      (11L, shuffled))
      .toDF("doc_id", "text")
    val jacc = Dedup
      .minhashPairs(revDocs, "doc_id", "text")
      .filter(col("jaccard") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jacc.contains((0L, 11L)), "shuffled doc still a shingle near-dup")
    val got = Dedup
      .editVerifiedPairs(revDocs, "doc_id", "text", minRatio = 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val pairs = got.map(p => (p._1, p._2)).toSet
    assert(pairs.contains((0L, 10L)), s"revision must verify: ${got.mkString(",")}")
    assert(!pairs.exists(p => p._2 == 11L && p._1 == 0L),
      s"shuffled halves must fail the edit gate: ${got.mkString(",")}")
    // the revision's edit distance is exactly lev("cat","kitten") = 5,
    // embedded in identical context
    val rev = got.find(p => (p._1, p._2) == ((0L, 10L))).get
    assert(rev._3 == 5L, s"lev=${rev._3}")
    assert(rev._4 > 0.95)
    // deterministic under repartitioning
    val again = Dedup
      .editVerifiedPairs(revDocs.repartition(7), "doc_id", "text", minRatio = 0.8)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(again == got.sortBy(p => (p._1, p._2)).toSeq)
    graft.plans.PlanAudit.assertScalable(
      Dedup.editVerifiedPairs(revDocs, "doc_id", "text"))
  }

  test("containmentJoin: quote contained in original (not vice versa); equals brute force") {
    import spark.implicits._
    val original =
      "the quick brown fox jumps over the lazy dog while rain falls on the quiet town square"
    val quote = "as reported earlier " +
      "the quick brown fox jumps over the lazy dog" // strict subset run
    val corpus = Seq(
      (1L, original), (2L, quote),
      (3L, "completely unrelated words about database engines and query planners")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentJoin(corpus, "doc_id", "text",
        threshold = 0.5, shingleSize = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // the quote's shingles are mostly inside the original...
    assert(got.contains((2L, 1L)), got.toString)
    // ...but the original is NOT contained in the quote (asymmetry)
    assert(!got.contains((1L, 2L)), got.toString)
    // brute-force replica over all ordered pairs — exact recall + values
    def shingles(t: String): Set[String] = t.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).sliding(3).filter(_.length == 3)
      .map(_.mkString(" ")).toSet
    val sets = Map(1L -> shingles(original), 2L -> shingles(quote),
      3L -> shingles("completely unrelated words about database engines and query planners"))
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a != b
      c = sets(a).intersect(sets(b)).size.toDouble / sets(a).size
      r = BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if r >= 0.5
    } yield (a, b) -> r).toMap
    assert(got == brute, s"got $got vs brute $brute")
    graft.plans.PlanAudit.assertScalable(
      Dedup.containmentJoin(corpus, "doc_id", "text", 0.5))
  }

  test("containmentJoin: docs shorter than the shingle width are excluded, matching the oracle") {
    import spark.implicits._
    // two IDENTICAL 2-token docs have no full 3-token shingle: the
    // truncated-window semantics would pair them at containment 1.0,
    // but the oracle (and now the operator) drops sub-width docs — and
    // a sub-width doc can never pair with a full-width one either
    val corpus = Seq(
      (1L, "hello world"), (2L, "hello world"),
      (3L, "hello world and more trailing content here"),
      (4L, "hello world and more trailing content here plus an unshared tail of words")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentJoin(corpus, "doc_id", "text",
        threshold = 0.5, shingleSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.exists(p => p._1 <= 2L || p._2 <= 2L),
      s"sub-width docs must not pair: $got")
    assert(got.contains((3L, 4L)), s"full-width containment intact: $got")
  }

  test("connectedComponents per-iteration work is flat: persisted edges/labels, 1 driver action and bounded stages per round") {
    import spark.implicits._
    // the GraphSpec loop-hygiene pin (round 10, also covers
    // mergeComponents, which delegates here): without the edge persist
    // the distinct'd bidirectional edge build re-executes every HashMin
    // round. A 40-node path can't converge inside 4 rounds, so maxIter
    // is the round dial. AQE off for deterministic stage accounting.
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val path = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      def run(maxIter: Int) = countWork {
        Dedup.connectedComponents(path, maxIter = maxIter).collect(); ()
      }
      run(1) // settle codegen/JIT
      val (j1, s1) = run(1)
      val (j4, s4) = run(4)
      // per iteration: exactly the fused changed-count action
      assert(j4 - j1 == 3, s"driver actions per round: j1=$j1 j4=$j4 (want 1/round)")
      val perRound = (s4 - s1) / 3.0
      assert(perRound <= 8.0,
        s"stages per round: s1=$s1 s4=$s4 perRound=$perRound — loop inputs recomputed?")
    }
  }
}
