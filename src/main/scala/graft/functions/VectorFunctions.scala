package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float|double>` columns, built entirely
  * from codegen'd higher-order functions (`zip_with` / `aggregate` /
  * `transform`) — no UDFs, so the expressions inline into whole-stage
  * codegen and distribute trivially.
  *
  * Not part of the reference surface (Frames has no array types); these
  * power the training-data-pipeline operators (similarity search,
  * embedding near-dup) that a 100 TB corpus engine needs.
  */
object VectorFunctions {

  /** Sum of an array<double>. */
  def arraySum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two equal-length vectors, accumulated in double in
    * element order (deterministic). Native
    * [[graft.functions.expressions.DotDoubleExpr]] — one fused loop per
    * pair (the HOF zip_with allocated an intermediate array per pair on
    * the brute-force MIPS join's hot path), numerically identical (same
    * in-order accumulation; native ≡ HOF pinned in SimilaritySpec). */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.Sketches.dotDouble(
      a.cast("array<double>"), b.cast("array<double>"))

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either norm is 0. Native
    * [[graft.functions.expressions.CosineSim]] expression — a single
    * allocation-free fused loop per pair (the HOF dot/norm composition
    * allocates an intermediate array per zip_with), numerically identical
    * (same in-order double accumulation). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.expressions.Sketches.cosineSim(
      a.cast("array<double>"), b.cast("array<double>"))

  /** L2 (Euclidean) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(arraySum(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => (x - y) * (x - y))))

  /** Pre-normalize a vector to unit length (cosine -> dot at query time:
    * at scale, normalize once on write, not per-pair). Vector and norm
    * are each bound once per row ([[Hof.bindOnce]]) — referencing
    * `norm2(a)` inside the division lambda would re-run the full
    * norm reduction per component. */
  def normalize(a: Column): Column =
    Hof.bindOnce(a.cast("array<double>")) { ad =>
      Hof.bindOnce(sqrt(aggregate(ad, lit(0.0), (acc, x) => acc + x * x))) { n =>
        when(n === 0.0, ad).otherwise(transform(ad, x => x / n))
      }
    }

  /** Sign-bit signature against a fixed list of hyperplanes: bit i is set
    * iff dot(v, planes(i)) >= 0. Returns a long (up to 64 planes) — the
    * random-hyperplane LSH key for cosine similarity. Planes are baked
    * into the native [[graft.functions.expressions.HyperplaneSig]]
    * expression (deterministic, seeded by the caller): all plane dots in
    * one fused loop per row. */
  def hyperplaneSignature(v: Column, planes: Seq[Seq[Double]]): Column = {
    require(planes.nonEmpty && planes.size <= 64, "1..64 hyperplanes")
    graft.functions.expressions.Sketches.hyperplaneSig(v.cast("array<double>"), planes)
  }

  /** Deterministic pseudo-random unit-ish hyperplanes from a seed (pure
    * Scala, driver-side, tiny). splitmix64-style mixing. */
  def seededPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until nPlanes).map { p =>
      (0 until dim).map { d =>
        val h = mix(seed + p * 1000003L + d)
        // map to [-1, 1)
        (h >>> 11).toDouble / (1L << 52).toDouble - 1.0
      }
    }
  }
}
