package graft

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** Randomized reference-model check for the session flow operators
  * ([[Funnel.transitionMatrix]] / [[Funnel.topPaths]]): a driver-side
  * Scala replica sessionizes the same generated event streams (gap
  * cut, (t, id) order, start/end states, quantized division, maxLen
  * truncation, count-desc/path-asc top-k) and must agree exactly —
  * the third leg beside the hand-case pins (FunnelSpec) and the
  * independent DuckDB replay (q87/q88 oracles). Seeded, deterministic;
  * timestamps collide on purpose so the id tiebreak is exercised. */
class FlowPropSpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new Random(1234)
  private val types = Vector("a", "b", "c", "d")
  private val gapHours = 6L

  private def genEvents(n: Int, users: Int): Seq[(Long, Long, String, Timestamp)] =
    (1 to n).map { i =>
      val u = 1L + rnd.nextInt(users)
      // hours 0..120 at coarse steps so gap cuts AND exact ts ties occur
      val h = rnd.nextInt(40) * 3
      val ts = Timestamp.valueOf(f"2024-01-0${1 + h / 24} ${h % 24}%02d:00:00")
      (u, i.toLong, types(rnd.nextInt(types.size)), ts)
    }

  /** Driver replica of the session split + per-session type sequences. */
  private def refSessions(
      rows: Seq[(Long, Long, String, Timestamp)]): Seq[Seq[String]] = {
    val gapUs = gapHours * 3600L * 1000000L
    rows.groupBy(_._1).values.toSeq.flatMap { ev =>
      val ordered = ev.sortBy(r => (r._4.getTime * 1000L, r._2))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      var prev = Long.MinValue
      ordered.foreach { case (_, _, e, ts) =>
        val t = ts.getTime * 1000L
        if (prev != Long.MinValue && t - prev >= gapUs)
          sessions += scala.collection.mutable.ArrayBuffer.empty[String]
        sessions.last += e
        prev = t
      }
      sessions.map(_.toSeq).toSeq
    }
  }

  test("transitionMatrix == driver reference on 3 random streams") {
    for (seedRound <- 1 to 3) {
      val rows = genEvents(n = 300 + 100 * seedRound, users = 12)
      val expected = {
        val trans = refSessions(rows).flatMap { s =>
          val fwd = (s :+ "__end").sliding(2).map(p => (p(0), p(1))).toSeq
          ("__start", s.head) +: fwd
        }
        val counts = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val totals = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
        counts.toSeq.map { case ((f, t), n) =>
          (f, t, n, n * 1000000L / totals(f))
        }.sortBy(r => (r._1, r._2))
      }
      val got = Funnel
        .transitionMatrix(
          rows.toDF("user_id", "event_id", "event_type", "ts"),
          "user_id", "event_type", "ts", "event_id", gapHours)
        .orderBy(col("from_state"), col("to_state"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == expected, s"round $seedRound")
    }
  }

  test("topPaths == driver reference on a random stream") {
    val rows = genEvents(n = 500, users = 15)
    val maxLen = 3
    val k = 12
    val expected = refSessions(rows)
      .map { s =>
        s.take(maxLen).mkString(">") + (if (s.size > maxLen) ">…" else "")
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }
      .take(k)
    val got = Funnel
      .topPaths(rows.toDF("user_id", "event_id", "event_type", "ts"),
        "user_id", "event_type", "ts", "event_id", gapHours, maxLen, k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    assert(got == expected)
  }
}
