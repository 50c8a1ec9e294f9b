package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one per suite, lazily created. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf0001 = "/root/testdata/sf0.001"

  /** Temporarily set session confs for `body`, restoring previous values. */
  def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (key, _) => key -> spark.conf.getOption(key) }
    pairs.foreach { case (key, v) => spark.conf.set(key, v) }
    try body finally olds.foreach {
      case (key, Some(v)) => spark.conf.set(key, v)
      case (key, None) => spark.conf.unset(key)
    }
  }

  /** (driver actions, completed stages) during `body` — the loop-hygiene
    * instrument (see GraphSpec's per-round pins). Driver actions =
    * QueryExecutionListener events — one per blocking Dataset action
    * (collect / count / checkpoint); broadcast-exchange subjobs never
    * fire it, which is the semantic line we're pinning. Stages = EVERY
    * completed stage on any thread (so re-executed shuffles DO count —
    * the signature of an unpersisted loop input). Both buses are
    * async — poll to quiescence before reading. */
  def countWork(body: => Unit): (Int, Int) = {
    import org.apache.spark.scheduler._
    val actions = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { actions.incrementAndGet(); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = { actions.incrementAndGet(); () }
    }
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
    }
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    spark.listenerManager.register(qel)
    try body finally {
      var prev = -1
      var cur = actions.get + stages.get
      var spins = 0
      while (prev != cur && spins < 50) {
        Thread.sleep(100); prev = cur; cur = actions.get + stages.get; spins += 1
      }
      spark.listenerManager.unregister(qel)
      sc.removeSparkListener(listener)
    }
    (actions.get, stages.get)
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
