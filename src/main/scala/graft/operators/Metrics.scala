package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** One-pass pipeline telemetry. A cleaning pipeline wants per-stage
  * counters (rows in/out, tokens dropped, dedup survivors) — but a
  * separate `count()` per stage re-executes the plan up to that stage:
  * at 100 TB that is one full corpus read PER METRIC. `observe` attaches
  * named aggregates that are computed INSIDE the same action that
  * produces the output — zero extra passes, exact values, collected on
  * the driver after the action completes.
  *
  * {{{
  *   val (scored, mScore) = Metrics.stage(docs.filter(q), "scored",
  *     count(lit(1)).as("rows"), sum("n_tokens").as("tokens"))
  *   val (deduped, mDedup) = Metrics.stage(Dedup.exact(scored, ...), "deduped",
  *     count(lit(1)).as("rows"))
  *   deduped.write...          // ONE action
  *   mScore.get("rows"); mDedup.get("rows")   // counters, no re-read
  * }}}
  *
  * Works identically under Structured Streaming (per micro-batch via
  * StreamingQueryListener). Each Observation is single-use — create a
  * fresh stage per action, as the pipeline naturally does. */
object Metrics {

  /** Attach named one-pass counters to a pipeline stage. Returns the
    * instrumented frame (use it downstream!) and the handle whose
    * `.get`/`.getAsJava` yields the metric row after the next action. */
  def stage(
      df: DataFrame,
      name: String,
      metrics: Column*): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "observe needs at least one metric column")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
