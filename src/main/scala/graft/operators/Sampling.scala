package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the way a 100 TB pipeline samples:
  * no RNG state, no sort, no sampling pass. A row's fate is a pure
  * function of its id, so samples are reproducible across reruns,
  * partitionings and cluster sizes, stable under corpus growth (adding
  * rows never flips existing decisions), and cheap (one hash expression
  * fused into the scan).
  *
  * Beyond the reference's scope (Frames has no sampling); complements the
  * deterministic split (p03) and stratified quota sample (q43).
  */
object Sampling {

  /** Uniform keep-decision with probability `rate`:
    * pmod(xxhash64(id), buckets) < rate * buckets. */
  def uniformKeep(idCol: Column, rate: Double, buckets: Long = 1000000L): Column =
    pmod(xxhash64(idCol), lit(buckets)).cast("double") < lit(rate * buckets)

  /** Weighted keep-decision: accept with probability `acceptProb` (a
    * per-row Column in [0,1], e.g. a quality score scaled by a global
    * rate). The hash is uniform on [0, buckets), so
    * P(keep) = acceptProb exactly (up to 1/buckets quantization). */
  def weightedKeep(idCol: Column, acceptProb: Column, buckets: Long = 1000000L): Column =
    pmod(xxhash64(idCol), lit(buckets)).cast("double") < acceptProb * lit(buckets.toDouble)
}
