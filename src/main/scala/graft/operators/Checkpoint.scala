package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-cut strategy for the iterative operators ([[Graph]],
  * [[Dedup.connectedComponents]]/[[Dedup.mergeComponents]],
  * [[Similarity.kCenterGreedy]]): every synchronous round rebuilds the
  * state frame from the previous round's, so without a cut the logical
  * plan deepens (or doubles) per iteration — the cut pins each round as
  * a flat `LogicalRDD`.
  *
  * Two built-ins:
  *   - [[Checkpoint.local]] (the default): `localCheckpoint` —
  *     executor-local blocks, no durable storage needed, the right
  *     choice on a single machine or when a lost executor may simply
  *     rerun the job.
  *   - [[Checkpoint.reliable]]: `checkpoint` against
  *     `spark.sparkContext.setCheckpointDir(...)` — survives executor
  *     loss mid-iteration, the right choice for a multi-hour PageRank
  *     over a 100 TB-derived edge list where losing one of 1000
  *     executors must not kill the job.
  *
  * The `eager` flag is the operator's, not the caller's: loops that
  * fuse the materialization into their own next action (CC's
  * changed-count) cut lazily; loops whose next step is a driver
  * `collect` cut eagerly. A custom strategy must respect it — an
  * always-lazy cut under an eager contract leaves the round
  * unmaterialized when upstream caches are released.
  */
trait Checkpoint {
  def cut(df: DataFrame, eager: Boolean): DataFrame
}

object Checkpoint {
  /** Executor-local blocks (default): fast, not executor-loss-safe. */
  val local: Checkpoint = new Checkpoint {
    def cut(df: DataFrame, eager: Boolean): DataFrame = df.localCheckpoint(eager)
  }

  /** Durable checkpoint under `SparkContext.setCheckpointDir` (point it
    * at HDFS/object storage on a cluster): survives executor loss. */
  val reliable: Checkpoint = new Checkpoint {
    def cut(df: DataFrame, eager: Boolean): DataFrame = df.checkpoint(eager)
  }

  /** Adapt a plain function (applied at every cut site, eager or not). */
  def apply(f: (DataFrame, Boolean) => DataFrame): Checkpoint = new Checkpoint {
    def cut(df: DataFrame, eager: Boolean): DataFrame = f(df, eager)
  }
}
