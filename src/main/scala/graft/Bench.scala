package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Uses the `noop` sink so the full plan executes
  * (joins, windows, LSH shuffles) without count()-only column pruning
  * hiding work, and without any driver-side collect. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // QUIET-BOX guard: timings taken while the machine still carries
    // load from a preceding run (round 8's record started <60 s after
    // a full correctness sweep; spread_med_pct read 44%) are
    // unreadable. Wait — bounded — for the 1-minute loadavg to settle
    // before any timing, and RECORD the load + cooldown in the output
    // so a drifted record identifies itself.
    def loadavg(): Double =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.mkString.split(" ")(0).toDouble finally src.close()
      } catch { case _: Throwable => -1.0 }
    val loadStart = loadavg()
    // Round-10 tightening: round 9's record started at load 6.41 under a
    // maxLoad of 8.0 — the gate never fired and the artifact self-reported
    // 59% spread. A 1-minute loadavg decays with a ~1 min half-life, so
    // even a full correctness sweep settles under 2.0 within ~4-5 min;
    // budget 15 so the gate, not the timeout, is the common path.
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_MAX_LOAD", "2.0").toDouble
    val cooldownMax = sys.env.getOrElse("SPARK_GRAFT_COOLDOWN_MAX", "900").toInt
    var cooldownSec = 0
    while (loadStart >= 0 && loadavg() > maxLoad && cooldownSec < cooldownMax) {
      Thread.sleep(5000); cooldownSec += 5
    }
    val loadBench = loadavg()
    val cooldownTimedOut = loadBench > maxLoad && loadBench >= 0
    // Throwaway warehouse per run: the index-building queries (s05, p10)
    // create managed bucketed tables, and a shared ./spark-warehouse
    // accumulates state across rounds that can perturb timings and race
    // concurrent harness runs. Deleted on JVM exit.
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft-bench-wh").toFile
    warehouse.deleteOnExit()
    // Partition-count sensitivity knob (round 14): at 100 TB the one
    // config that changes is spark.sql.shuffle.partitions (SCALE.md);
    // override it here WITHOUT changing the executor thread count to
    // verify no plan degenerates when the knob moves toward cluster
    // values (hidden single-partition window, broadcast flip).
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    // AQE coalescing floor: measured both ways in round 15 — a 64k
    // floor (keep byte-light stages wide) made d15 2.3x SLOWER (AQE
    // stage fan-out duplicated the expensive verify subtree across
    // concurrent jobs); the scan fan-out in Tables fixed the observed
    // starvation without it. Keep Spark's default, expose the knob.
    val aqeMinPartition =
      sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "1m")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        aqeMinPartition)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", warehouse.getAbsolutePath)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(): Unit
      }
      rm(warehouse)
    }
    // ERROR, not WARN: the caller captures only the TAIL of the log, and
    // Spark's WARN chatter (broadcast sizes, cache notices) can push the
    // result JSON line out of that window.
    spark.sparkContext.setLogLevel("ERROR")

    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // microbenchmark hygiene: don't let the previous rep's garbage
      // bill (young-gen debt, humongous shuffle buffers) land inside
      // this rep's timing window
      System.gc()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // `runMain graft.Bench q01 q03` restricts the set. Each query runs
    // SPARK_GRAFT_REPS times (default 3) and the headline number is the
    // MINIMUM — the steady-state throughput a long-running cluster job
    // sees, with single-run JIT/codegen/scan-cache noise excluded (one
    // cold-vs-steady round showed a 6x swing on an unchanged query). The
    // first-rep ("cold") times are emitted alongside for completeness.
    val wanted = args.toSet
    val selected =
      if (wanted.isEmpty) SparkEntry.benchQueries
      else SparkEntry.benchQueries.filter(q => wanted.exists(q.name.startsWith))

    // warm the JVM/codegen paths of each SELECTED query once AT THE
    // TARGET SF so the timed reps measure steady-state throughput (the
    // 100 TB question), not first-call JIT + codegen + page-cache fill
    // — cold-vs-warm on the text path alone is ~10x, and a warm-up at
    // sf0.001 only (the pre-round-9 protocol) left the first timed rep
    // paying the target SF's scan-cache/JIT residue, which alone pushed
    // spread_med_pct to 30-50%. Restricting warm-up to the selection
    // keeps `runMain graft.Bench q56` a true isolation run; the `cold`
    // map records this warm-up pass per query.
    val coldTimes = selected.map { q => (q.name, timeOne(q.name, q.run)) }.toMap

    // default 5 (round 9): on this virtualized host the same binary
    // spreads 30-50% run to run and min-of-3 moved a 59-query total by
    // +29% median while min-of-5, minutes later, read dead even with
    // the prior round (-1.2%) — three reps do not reach the floor
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val results = selected.map { q =>
      (q.name, (0 until reps).map(_ => timeOne(q.name, q.run)))
    }
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    def jmap(entries: Seq[(String, Double)], key: String => String): String = entries
      .map { case (k, v) => "\"" + key(k) + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // per-query spread over the reps: a cross-round delta is only a
    // regression signal when it exceeds what the same binary shows run
    // to run (rounds 6/7 each burned a judging cycle on environment
    // drift that min-only records could not self-identify)
    def minOf(ts: Seq[Double]) = ts.min // any failed rep (-1) marks the query failed
    def medianOf(ts: Seq[Double]) = ts.sorted.apply(ts.size / 2)
    val total = results.map(r => minOf(r._2)).filter(_ >= 0).sum
    // If the load gate timed out, this run's timings are suspect: point
    // the record at the last QUIET run's durable artifact so a valid
    // number survives alongside the contaminated one.
    val quietFile = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_QUIET", "bench_out_quiet.json"))
    val quietRef: String =
      if (!cooldownTimedOut) ""
      else if (!java.nio.file.Files.exists(quietFile)) ""
      else {
        val prior = new String(
          java.nio.file.Files.readAllBytes(quietFile), "UTF-8")
        """"value":([0-9.]+)""".r.findFirstMatchIn(prior)
          .map(m => s""","last_quiet_total":${m.group(1)},"last_quiet_file":"$quietFile"""")
          .getOrElse("")
      }
    val spreads = results
      .filter(r => minOf(r._2) > 0)
      .map(r => 100.0 * (r._2.max - minOf(r._2)) / minOf(r._2))
    val spreadPct = if (spreads.isEmpty) 0.0 else medianOf(spreads)

    // ISOLATED MODE (round 11): in-suite per-query deltas on this host
    // spread ±50% — g04 read +49% in-suite while an isolated quiet
    // min-of-5 read dead level; the cross-talk is the 74-query suite
    // itself (page-cache churn, JIT/GC debt from neighbors). Re-measure
    // the N heaviest queries AFTER the suite, each in its own quiet
    // pocket: randomized order (so a slow neighbor can't systematically
    // tax the same victim), a short cooldown + GC before each query,
    // min-of-ISOLATED_REPS. This block is the per-query number of
    // record; the in-suite map remains the total-throughput number.
    // a filtered `runMain graft.Bench q56` is already an isolation run —
    // skip the block unless explicitly requested
    val isolatedN =
      sys.env.get("SPARK_GRAFT_ISOLATED_N").map(_.toInt)
        .getOrElse(if (wanted.isEmpty) 10 else 0)
    val isolatedReps = sys.env.getOrElse("SPARK_GRAFT_ISOLATED_REPS", "5").toInt
    val isolatedCooldownSec =
      sys.env.getOrElse("SPARK_GRAFT_ISOLATED_COOLDOWN", "8").toInt
    // The isolated set of record (round 12): pinned to BENCH_r11's
    // block so cross-round bench_diff compares identical key sets — a
    // per-run top-N churns membership with suite noise. Full runs use
    // this set by default; SPARK_GRAFT_ISOLATED_SET overrides with an
    // explicit comma-separated prefix list, and the special value
    // "auto" restores the dynamic top-N-heaviest-of-this-run selection
    // (for scouting which queries BELONG in the next pinned set).
    val pinnedDefault = Seq(
      "d15_lsh_recall", "g01_pagerank", "g12_anf",
      "g16_pagerank_weighted", "g17_effective_diameter",
      "p12_pack_tokens", "p26_pipeline_demo", "p36_analytics_demo",
      "q86_basket_rules", "t19_bpe_learned_corpus")
    val pinnedSet = sys.env.get("SPARK_GRAFT_ISOLATED_SET")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .orElse(if (wanted.isEmpty && isolatedN > 0) Some(pinnedDefault) else None)
      .filterNot(_ == Seq("auto")) // SPARK_GRAFT_ISOLATED_N=0 still skips
    val heavy = pinnedSet match {
      case Some(names) =>
        results.map(_._1)
          .filter(n => names.exists(n.startsWith))
      case None =>
        results
          .filter(r => minOf(r._2) > 0)
          .sortBy(r => -minOf(r._2))
          .take(isolatedN)
          .map(_._1)
    }
    // TIERED FULL COVERAGE (round 13): the in-suite per-query numbers
    // spread ~47% median on this host, so cross-round deltas were
    // attributable for only the 10 isolated queries (r12's t25 "+73%"
    // phantom had no code change on its path). Every OTHER query now
    // also gets its own quiet pocket — a cheaper one (shorter cooldown,
    // min-of-3): the light queries run 0.1–1.5 s each, so 3 isolated
    // reps already sit far below the suite's cross-talk floor. The
    // heavy tier keeps the full budget so its numbers stay comparable
    // to the r11/r12 blocks. One randomized order over the union so a
    // slow neighbor can't systematically tax the same victim.
    val lightReps =
      sys.env.getOrElse("SPARK_GRAFT_ISOLATED_LIGHT_REPS", "3").toInt
    val lightCooldownSec =
      sys.env.getOrElse("SPARK_GRAFT_ISOLATED_LIGHT_COOLDOWN", "2").toInt
    val lightTier =
      if (sys.env.getOrElse("SPARK_GRAFT_ISOLATED_LIGHT", "1") == "0" ||
          wanted.nonEmpty || isolatedN <= 0) Seq.empty[String]
      else {
        val heavySet = heavy.toSet
        results.filter(r => minOf(r._2) > 0).map(_._1)
          .filterNot(heavySet)
      }
    // No silent caps (r13 ADVICE): a query whose in-suite reps all
    // errored (minOf <= 0) gets no isolated pocket — name it, in the
    // log AND the artifact, so a partially failed suite is visible
    // instead of reading as "every query re-measured isolated".
    val isolatedExcluded =
      if (wanted.nonEmpty || isolatedN <= 0) Seq.empty[String]
      else results.filter(r => minOf(r._2) <= 0).map(_._1)
    if (isolatedExcluded.nonEmpty)
      System.err.println(
        s"[bench] EXCLUDED from isolated pass (all in-suite reps failed): " +
          isolatedExcluded.mkString(", "))
    val heavySet = heavy.toSet
    val isoOrder = new scala.util.Random(System.nanoTime())
      .shuffle(heavy ++ lightTier)
    val byName = selected.map(q => q.name -> q).toMap
    // STEAL-AWARE POCKETS (round 14): run B of the r13 paired experiment
    // read the whole suite uniformly +22.5% with nonzero /proc/stat
    // steal — cross-run comparability depended on a quiet window the
    // artifact could not certify per query. Sample the host-wide steal
    // counter around each pocket; if the pocket's steal FRACTION
    // (steal jiffies / (elapsed * HZ * cpus)) exceeds the threshold,
    // re-run the pocket ONCE and keep the calmer attempt. Every pocket
    // records its steal fraction and any retry, so a contaminated run's
    // outliers self-identify instead of poisoning cross-round diffs.
    val stealFracMax =
      sys.env.getOrElse("SPARK_GRAFT_STEAL_FRAC", "0.005").toDouble
    // The aggregate `cpu` line in /proc/stat covers the HOST's CPUs;
    // in a cgroup-limited container availableProcessors undercounts
    // them, inflating the recorded fraction and triggering spurious
    // retries. Count the per-cpu lines instead (fall back to
    // availableProcessors when /proc/stat is unreadable).
    val hostCpus: Double =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try {
          val n = src.getLines().count(l =>
            l.startsWith("cpu") && l.length > 3 && l.charAt(3).isDigit)
          if (n > 0) n.toDouble
          else Runtime.getRuntime.availableProcessors.toDouble
        } finally src.close()
      } catch {
        case _: Throwable => Runtime.getRuntime.availableProcessors.toDouble
      }
    def stealTicks(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try {
          val f = src.getLines().next().trim.split("\\s+")
          if (f.length > 8) f(8).toLong else -1L
        } finally src.close()
      } catch { case _: Throwable => -1L }
    final case class Pocket(
      ts: Seq[Double], stealFrac: Double, retried: Boolean,
      stealFracRetry: Double, kept: String)
    def runPocket(name: String, nReps: Int): (Seq[Double], Double) = {
      val s0 = stealTicks()
      val t0 = System.nanoTime()
      val ts = (0 until nReps).map(_ => timeOne(name, byName(name).run))
      val s1 = stealTicks()
      val elapsed = (System.nanoTime() - t0) / 1e9
      val frac =
        if (s0 < 0 || s1 < 0 || elapsed <= 0) -1.0
        // USER_HZ is 100 on every Linux this runs on (sysconf(_SC_CLK_TCK))
        else (s1 - s0) / (elapsed * 100.0 * hostCpus)
      (ts, frac)
    }
    val isolated = isoOrder.map { name =>
      val (nReps, cdSec) =
        if (heavySet(name)) (isolatedReps, isolatedCooldownSec)
        else (lightReps, lightCooldownSec)
      Thread.sleep(cdSec * 1000L)
      System.gc()
      val (ts1, frac1) = runPocket(name, nReps)
      val pocket =
        if (frac1 <= stealFracMax || minOf(ts1) <= 0)
          Pocket(ts1, frac1, retried = false, -1.0, "first")
        else {
          System.err.println(f"[bench] $name pocket saw steal frac $frac1%.4f > $stealFracMax%.4f — retrying once")
          Thread.sleep(cdSec * 1000L)
          System.gc()
          val (ts2, frac2) = runPocket(name, nReps)
          if (frac2 >= 0 && frac2 < frac1 && minOf(ts2) > 0)
            Pocket(ts2, frac1, retried = true, frac2, "retry")
          else Pocket(ts1, frac1, retried = true, frac2, "first")
        }
      name -> pocket
    }.sortBy(_._1)
    // The isolated headline is the MEDIAN-based dispersion
    // (median−min)/min, not (max−min)/min: the reported number per
    // query is min-of-N, and on this virtualized host a single
    // CPU-steal straggler rep inflates the max without degrading the
    // min estimator at all (observed: one 3.1 s rep over a 1.97 s min
    // while the other four reps sat within 10%). (median−min)/min says
    // how far a TYPICAL rep sits above the floor — the actual
    // stability of the number of record. The max-based spread stays in
    // the per-query detail for honesty about worst-case reps.
    def dispOf(ts: Seq[Double]): Double =
      if (minOf(ts) <= 0) -1.0
      else 100.0 * (medianOf(ts) - minOf(ts)) / minOf(ts)
    val isoSpreads = isolated
      .filter(r => minOf(r._2.ts) > 0)
      .map(r => dispOf(r._2.ts))
    val isoSpreadPct = if (isoSpreads.isEmpty) 0.0 else medianOf(isoSpreads)
    // The heavy tier's dispersion stat is kept SEPARATE so it stays
    // comparable to the r11/r12 isolated blocks (same 10 keys, same
    // budget); the all-query stat is the round-13 full-coverage number.
    val isoHeavySpreads = isolated
      .filter(r => heavySet(r._1) && minOf(r._2.ts) > 0)
      .map(r => dispOf(r._2.ts))
    val isoHeavySpreadPct =
      if (isoHeavySpreads.isEmpty) 0.0 else medianOf(isoHeavySpreads)
    val isoRetries = isolated.count(_._2.retried)
    def isoJson(key: String => String): String =
      if (isolated.isEmpty) ""
      else {
        val entries = isolated.map { case (n, p) =>
          val ts = p.ts
          val sp =
            if (minOf(ts) <= 0) -1.0
            else 100.0 * (ts.max - minOf(ts)) / minOf(ts)
          "\"" + key(n) + "\":{\"min\":" + f3(minOf(ts)) +
            ",\"median\":" + f3(medianOf(ts)) + ",\"max\":" + f3(ts.max) +
            ",\"disp_pct\":" + f3(dispOf(ts)) +
            ",\"spread_pct\":" + f3(sp) +
            ",\"steal_frac\":" + String.format(java.util.Locale.ROOT, "%.5f", p.stealFrac) +
            ",\"steal_retried\":" + p.retried +
            (if (p.retried)
              ",\"steal_frac_retry\":" + String.format(java.util.Locale.ROOT, "%.5f", p.stealFracRetry) +
                ",\"kept\":\"" + p.kept + "\""
             else "") +
            ",\"tier\":\"" + (if (heavySet(n)) "heavy" else "light") + "\"}"
        }.mkString("{", ",", "}")
        val excl = isolatedExcluded.map("\"" + _ + "\"").mkString("[", ",", "]")
        s""","isolated":$entries,"isolated_excluded":$excl,"isolated_reps":$isolatedReps,"isolated_cooldown_sec":$isolatedCooldownSec,"isolated_light_reps":$lightReps,"isolated_light_cooldown_sec":$lightCooldownSec,"steal_frac_max":$stealFracMax"""
      }
    val isoSummary =
      if (isolated.isEmpty) ""
      else s""","isolated_n":${isolated.size},"isolated_excluded_n":${isolatedExcluded.size},"isolated_steal_retries":$isoRetries,"isolated_spread_med_pct":${f3(isoSpreadPct)},"isolated_heavy_n":${isoHeavySpreads.size},"isolated_heavy_spread_med_pct":${f3(isoHeavySpreadPct)}"""
    def line(key: String => String, full: Boolean): String = {
      val qs = jmap(results.map(r => r._1 -> minOf(r._2)), key)
      val cold = jmap(results.map(r => r._1 -> coldTimes(r._1)), key)
      val stats =
        if (!full) ""
        else {
          val med = jmap(results.map(r => r._1 -> medianOf(r._2)), key)
          val max = jmap(results.map(r => r._1 -> r._2.max), key)
          s""","median":$med,"max":$max${isoJson(key)}"""
        }
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","reps":$reps,"spread_med_pct":${f3(spreadPct)}$isoSummary,"load_start":${f3(loadStart)},"load_bench":${f3(loadBench)},"cooldown_sec":$cooldownSec,"cooldown_timeout":$cooldownTimedOut$quietRef,"queries":$qs,"cold":$cold$stats,"sf":"$sfDir"}"""
    }
    // MINIMAL summary line — totals + load fields only, NO per-query
    // maps, guaranteed to fit the caller's ~2 KB tail-capture window
    // intact (BENCH_r10's `parsed: null`: the 2.4 KB per-query line got
    // front-truncated and nothing downstream could parse it). Printed
    // LAST; per-query detail lives in the full-map line above it and in
    // the durable bench_out.json this line names.
    def minimalLine: String =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","nqueries":${results.size},"reps":$reps,"spread_med_pct":${f3(spreadPct)}$isoSummary,"load_start":${f3(loadStart)},"load_bench":${f3(loadBench)},"cooldown_sec":$cooldownSec,"cooldown_timeout":$cooldownTimedOut$quietRef,"detail_file":"${sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")}","sf":"$sfDir"}"""
    // Full-name record (with per-query median/max spread) → bench_out
    // .json (the durable artifact). The line printed to stdout uses the
    // short prefix of each query name ("q56_zorder_key" → "q56") because
    // the caller keeps only the last ~2 KB of output: the full-name line
    // can NEVER survive that window intact, while the compact line does.
    // Prefixes are almost always unique; on a collision (q56_a/q56_b)
    // fall back to full names rather than silently dropping a timing.
    val outFile = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
    java.nio.file.Files.write(outFile,
      (line(identity, full = true) + "\n").getBytes("UTF-8"))
    // A clean full-set run becomes the durable "last quiet" artifact the
    // next contaminated run can point at (full set only — a filtered
    // `runMain graft.Bench q56` total would be misleading as a fallback).
    if (!cooldownTimedOut && wanted.isEmpty)
      java.nio.file.Files.copy(outFile, quietFile,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    spark.stop()
    val shorts = results.map(_._1.takeWhile(_ != '_'))
    val shortKey: String => String =
      if (shorts.distinct.size == shorts.size) _.takeWhile(_ != '_') else identity
    // printed after Spark shutdown so no log chatter can follow; the
    // per-query compact line first (best-effort — survives when the
    // tail window is generous), the minimal summary line LAST (always
    // survives; this is the line of record for the caller's parser).
    println(line(shortKey, full = false))
    println(minimalLine)
  }
}
