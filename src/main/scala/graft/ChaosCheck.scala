package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Executor-loss drill for [[graft.operators.Checkpoint.reliable]] — the
  * end-to-end proof behind the 100 TB story: a multi-hour PageRank over a
  * 1000-executor cluster WILL lose executors, and the durable checkpoint
  * path must carry the iteration through that loss with bit-identical
  * results, not just write files (GraphSpec pins the files; this pins the
  * recovery).
  *
  * Runs as its OWN main (one SparkContext per JVM — the suites' shared
  * local[*] session can't coexist with this one) on a real two-executor
  * `local-cluster[2,1,1536]`: separate executor JVMs, real RPC, real
  * block/shuffle loss when one dies.
  *
  * Protocol:
  *   1. baseline ranks on the healthy cluster (default local checkpointer);
  *   2. chaos run with `Checkpoint.reliable` wrapped to HALT one executor
  *      JVM (`Runtime.halt` from inside a task — no shutdown hooks, the
  *      closest local stand-in for a machine loss) right after round 2's
  *      durable cut;
  *   3. the remaining rounds must complete on the degraded-then-restored
  *      cluster and the final ranks must equal the baseline exactly
  *      (pagerankQuantized is exact integer arithmetic — any divergence
  *      means recovery replayed state wrong).
  *
  * Drill 3 extends the same discipline to the STREAMING INGEST path: an
  * executor JVM halts during a `dedupIngestStep`'s classification write
  * and the recovered step must leave classifications + persisted index
  * bit-identical to a no-failure run (round 11 — previously only proven
  * by spec-level replay simulation).
  *
  * Prints ONE JSON line {"pass":…} and exits 0 (pass), 1 (mismatch), or
  * 2 (cluster never came up — environment, not code). Driven by
  * ExecutorLossSpec via a forked JVM.
  */
object ChaosCheck {
  def main(args: Array[String]): Unit = {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-chaos-ckpt")
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft-chaos-wh")
    // executor JVMs need the same JDK17 module opens the driver gets from
    // build.sbt; they inherit this JVM's classpath via the worker's
    // command builder, but javaOptions do NOT propagate
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1536]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraJavaOptions", addOpens)
      // drills 1/2 are pure-DataFrame plans (no user class ever reaches
      // an executor), but drill 3 ships a typed .map lambda + graft
      // expression kernels — the executor JVMs need the app classpath
      // or lambda deserialization dies with SerializedLambda CCE
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.sql.warehouse.dir", warehouse.toString)
      .getOrCreate()
    try {
      val sc = spark.sparkContext
      sc.setLogLevel("ERROR")
      sc.setCheckpointDir(ckpt.toString)
      // wait for both executors (driver also lists itself)
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (sc.statusTracker.getExecutorInfos.length < 3 &&
          System.nanoTime() < deadline) Thread.sleep(500)
      if (sc.statusTracker.getExecutorInfos.length < 3) {
        println("""{"pass":false,"reason":"cluster never reached 2 executors"}""")
        sys.exit(2)
      }

      // deterministic, fully recomputable edge list (no cached source to
      // lose): 300 nodes, two arithmetic out-edges each + a hub
      val edges = spark.range(0L, 300L).toDF("src")
        .select(col("src"), explode(array(
          (col("src") * 7 + 1) % 300,
          (col("src") * 13 + 5) % 300,
          lit(0L))).as("dst"))
        .filter(col("src") =!= col("dst"))

      def collectRanks(ckp: graft.operators.Checkpoint) =
        graft.operators.Graph
          .pagerankQuantized(edges, "src", "dst", iters = 4, checkpointer = ckp)
          .orderBy(col("node"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .toSeq

      val base = collectRanks(graft.operators.Checkpoint.local)

      // halt whichever executor runs partition 0 (first attempt only —
      // the retried task must not cascade)
      def killOneExecutor(): Unit =
        try sc.parallelize(0 until 2, 2).foreach { i =>
          if (i == 0 && org.apache.spark.TaskContext.get().attemptNumber() == 0)
            Runtime.getRuntime.halt(99)
        } catch { case _: org.apache.spark.SparkException => () }

      // chaos checkpointer: durable cut every invocation; right after
      // the `killAt`-th cut, hard-halt one executor JVM
      def chaosCheckpoint(killAt: Int): (graft.operators.Checkpoint, () => (Int, Boolean)) = {
        var rounds = 0
        var killed = false
        val ckp = graft.operators.Checkpoint { (df, eager) =>
          val cut = df.checkpoint(eager)
          rounds += 1
          if (rounds == killAt && !killed) { killed = true; killOneExecutor() }
          cut
        }
        (ckp, () => (rounds, killed))
      }

      val (prCkp, prState) = chaosCheckpoint(killAt = 2)
      val got = collectRanks(prCkp)
      val (prRounds, prKilled) = prState()
      val prPass = got == base && prKilled && prRounds == 4

      // drill 2: connectedComponents — lazy cuts every 5th HashMin
      // round; the kill fires at the FIRST cut (round 5 of ~17 on the
      // 18-chain), so most of the fixpoint runs on the recovered
      // cluster. Exactness bar: bit-identical (id, comp) labels.
      val chain = spark.range(0L, 17L).toDF("id_a")
        .select(col("id_a"), (col("id_a") + 1).as("id_b"))
        .union(spark.range(100L, 104L).toDF("id_a")
          .select(col("id_a"), (col("id_a") + 100).as("id_b")))
      def collectComps(ckp: graft.operators.Checkpoint) =
        graft.operators.Dedup
          .connectedComponents(chain, "id_a", "id_b", maxIter = 25,
            checkpointer = ckp)
          .orderBy(col("id"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .toSeq
      val ccBase = collectComps(graft.operators.Checkpoint.local)
      val (ccCkp, ccState) = chaosCheckpoint(killAt = 1)
      val ccGot = collectComps(ccCkp)
      val (ccRounds, ccKilled) = ccState()
      val ccPass = ccGot == ccBase && ccKilled && ccRounds >= 2

      // drill 3: STREAMING INGEST — an executor JVM dies DURING a
      // dedupIngestStep (the classification write is the first action
      // that touches the batch, so the halt lands inside that job) and
      // the retried tasks + marker-fenced step must leave BOTH the
      // classifications and the persisted index identical to a
      // no-failure run over the same data. This is the recovery the
      // spec-level replay simulation (StreamingSpec) models; here the
      // loss is a real JVM halt on a real two-executor cluster.
      import spark.implicits._
      val killFile = java.nio.file.Files
        .createTempDirectory("graft-chaos-ingest").resolve("killed").toString
      // one halt total, wherever the first task to see no marker runs:
      // createFile is the atomic claim; the loser of the race (or any
      // retry) sees the file and passes through
      def chaosBatch(rows: Seq[(Long, String)]): org.apache.spark.sql.DataFrame =
        spark.createDataset(rows).repartition(2)
          .map { case (id, text) =>
            val p = java.nio.file.Paths.get(killFile)
            if (!java.nio.file.Files.exists(p)) {
              try {
                java.nio.file.Files.createFile(p)
                Runtime.getRuntime.halt(99)
              } catch {
                case _: java.nio.file.FileAlreadyExistsException => ()
              }
            }
            (id, text)
          }.toDF("doc_id", "text")
      val seedDocs = Seq(
        (1L, "seed document about rivers and stone bridges"),
        (2L, "seed document describing mountain weather patterns"))
      val batch0 = Seq(
        (100L, "brand new content alpha beta gamma"),
        (101L, "seed document about rivers and stone bridges"))
      val batch1 = Seq(
        (200L, "brand new content alpha beta gamma"), // copy of NOVEL 100
        (201L, "entirely different follow-up material"))
      def runIngest(table: String, target: String,
          mkBatch1: Seq[(Long, String)] => org.apache.spark.sql.DataFrame)
          : (Seq[Seq[Any]], Seq[Seq[Any]]) = {
        graft.operators.Dedup.writeDedupIndex(
          seedDocs.toDF("doc_id", "text"), "doc_id", "text", table,
          numBuckets = 2)
        graft.streaming.EventStreams.dedupIngestStep(
          table, batch0.toDF("doc_id", "text"), 0L, "doc_id", "text",
          target, numBuckets = 2, shingleSize = 3, numHashes = 64,
          bands = 16, seed = 42L, tau = 0.4)
        graft.streaming.EventStreams.dedupIngestStep(
          table, mkBatch1(batch1), 1L, "doc_id", "text",
          target, numBuckets = 2, shingleSize = 3, numHashes = 64,
          bands = 16, seed = 42L, tau = 0.4)
        val classed = graft.streaming.EventStreams
          .committedBatches(spark, target)
          .collect().map(_.toSeq.map(v => v: Any)).toSeq
          .sortBy(_.mkString("|"))
        val index = spark.table(s"${table}_exact")
          .collect().map(_.toSeq.map(v => v: Any)).toSeq
          .sortBy(_.mkString("|"))
        (classed, index)
      }
      val chaosTgt = java.nio.file.Files
        .createTempDirectory("graft-chaos-ded").toString
      val refTgt = java.nio.file.Files
        .createTempDirectory("graft-chaos-dedref").toString
      val (chaosClass, chaosIdx) = runIngest("chaos_ded", chaosTgt, chaosBatch)
      val ingKilled = java.nio.file.Files
        .exists(java.nio.file.Paths.get(killFile))
      val (refClass, refIdx) =
        runIngest("chaos_ref", refTgt, rows => rows.toDF("doc_id", "text"))
      val ingPass = ingKilled && chaosClass == refClass &&
        chaosIdx == refIdx && chaosClass.nonEmpty && chaosIdx.nonEmpty

      val pass = prPass && ccPass && ingPass
      println(s"""{"pass":$pass,"pagerank":{"pass":$prPass,"rounds":$prRounds,"killed":$prKilled,"nodes":${base.size}},"cc":{"pass":$ccPass,"cuts":$ccRounds,"killed":$ccKilled,"nodes":${ccBase.size}},"ingest":{"pass":$ingPass,"killed":$ingKilled,"classified":${chaosClass.size},"index_rows":${chaosIdx.size}}}""")
      if (!pass) sys.exit(1)
    } finally {
      spark.stop()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(): Unit
      }
      rm(ckpt.toFile)
      rm(warehouse.toFile)
    }
  }
}
