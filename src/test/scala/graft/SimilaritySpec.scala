package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Pins for [[Similarity.annRecallCurve]] — the ANN self-evaluation.
  * The value-level gate is the driver's DuckDB hash-compare of
  * s07_ann_recall; here we pin the two properties that make the metric
  * trustworthy at ANY data scale, independent of the oracle:
  * full-budget recall is exactly 1.0 by construction, and recall is
  * monotone in the probe budget. */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf0001).embeddings
  private lazy val centroids =
    Similarity.sampleCentroids(emb, "vec_id", "embedding", nCells = 16)

  private lazy val curve = Similarity
    .annRecallCurve(
      corpus = emb,
      queries = emb.filter(col("vec_id") < 10),
      idCol = "vec_id", vecCol = "embedding", k = 5,
      centroids = centroids, nProbes = Seq(1, 2, 4, 16))
    .collect()
    .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("n_probe"),
      r.getAs[Long]("hits"), r.getAs[Double]("recall")))

  test("probing every cell recovers brute force exactly (recall 1.0)") {
    val full = curve.filter(_._2 == 16)
    assert(full.length == 10, s"expected 10 full-budget rows, got ${full.length}")
    full.foreach { case (q, _, hits, recall) =>
      assert(hits == 5L && recall == 1.0,
        s"query $q at n_probe=16: hits=$hits recall=$recall (must be exact)")
    }
  }

  test("recall is monotone non-decreasing in the probe budget") {
    curve.groupBy(_._1).foreach { case (q, rows) =>
      val byBudget = rows.sortBy(_._2).map(_._4)
      byBudget.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0) <= w(1),
          s"query $q: recall dropped ${w(0)} -> ${w(1)} as budget grew")
      }
    }
  }

  test("hits never exceed k and recall is hits/k") {
    curve.foreach { case (q, p, hits, recall) =>
      assert(hits >= 0L && hits <= 5L, s"query $q n_probe=$p hits=$hits")
      assert(math.abs(recall - hits / 5.0) < 1e-9,
        s"query $q n_probe=$p recall=$recall != hits/k")
    }
  }
}
