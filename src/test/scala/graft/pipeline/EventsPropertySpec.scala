package graft.pipeline

import java.sql.Timestamp
import java.time.{DayOfWeek, ZoneOffset}
import java.time.temporal.TemporalAdjusters

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the events family — sessions, funnel, cohort
  * retention — against naive driver-side replays on random event logs
  * (fixed seeds). The operators' failure modes are all ORDERING and
  * BOUNDARY classes a fixture rarely hits densely: a gap of exactly
  * the threshold (must NOT split), equal timestamps tie-broken by
  * event_id, a funnel step at the same instant as the previous step
  * (>= must admit it), cohort/activity weeks straddling Monday
  * midnight. Values are 2-decimal so the DECIMAL(18,6) quantization
  * is exact on both sides. */
class EventsPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("events-props")
    .getOrCreate()
  import spark.implicits._

  private val gapUs = 30L * 60 * 1000000

  private case class Ev(eventId: Long, userId: Long, eventType: String,
                        ts: Timestamp, value: Double)

  private def randomLog(seed: Int): Seq[Ev] = {
    val r = new scala.util.Random(6200 + seed)
    val t0 = Timestamp.valueOf("2026-03-02 00:00:00").getTime // a Monday
    var prevUs = t0 * 1000
    (0 until 1500).map { i =>
      // ~1/8 of events reuse the previous event's exact instant, so
      // equal-timestamp ties are dense
      val us = if (r.nextInt(8) == 0) prevUs
        else (t0 + r.nextLong(30L * 86400 * 1000)) * 1000 + r.nextInt(1000000)
      prevUs = us
      val t = new Timestamp(us / 1000)
      t.setNanos((us % 1000000).toInt * 1000)
      Ev(i.toLong, r.nextInt(40).toLong,
        Seq("view", "click", "purchase", "signup")(r.nextInt(4)),
        t, r.nextInt(200000) / 100.0)
    }.sortBy(_.eventId)
  }

  private def toUs(t: Timestamp): Long = t.getTime * 1000 + t.getNanos / 1000 % 1000

  private def df(log: Seq[Ev]) =
    log.map(e => (e.eventId, e.userId, e.eventType, e.ts, e.value))
      .toDF("event_id", "user_id", "event_type", "ts", "value")

  private def tsOfUs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos((us % 1000000).toInt * 1000)
    t
  }

  test("property: sessions equal a naive gap-split replay (threshold-exact gaps included)") {
    (1 to 3).foreach { seed =>
      // planted boundary user: a gap of EXACTLY the 30-min threshold
      // must NOT split (the operator is strict-greater), one more
      // microsecond must
      val b0 = Timestamp.valueOf("2026-03-10 12:00:00").getTime * 1000
      val planted = Seq(
        Ev(9001, 999, "view", tsOfUs(b0), 1.0),
        Ev(9002, 999, "view", tsOfUs(b0 + gapUs), 2.0),
        Ev(9003, 999, "view", tsOfUs(b0 + gapUs + gapUs + 1), 3.0))
      val log = randomLog(seed) ++ planted
      val want = log.groupBy(_.userId).flatMap { case (u, evs) =>
        val sorted = evs.sortBy(e => (toUs(e.ts), e.eventId))
        val sess = scala.collection.mutable.ArrayBuffer.empty[Vector[Ev]]
        sorted.foreach { e =>
          if (sess.nonEmpty && toUs(e.ts) - toUs(sess.last.last.ts) <= gapUs)
            sess(sess.size - 1) = sess.last :+ e
          else sess += Vector(e)
        }
        sess.zipWithIndex.map { case (es, i) =>
          (u, (i + 1).toLong) -> ((es.head.ts, es.last.ts, es.size.toLong,
            es.map(e => BigDecimal(e.value).setScale(6, BigDecimal.RoundingMode.HALF_UP))
              .sum.toDouble))
        }
      }
      val got = Events.sessions(df(log)).collect().map { r =>
        (r.getLong(0), r.getLong(1)) ->
          ((r.getTimestamp(2), r.getTimestamp(3), r.getLong(4), r.getDouble(5)))
      }.toMap
      assert(got === want, s"seed $seed: sessions differ")
    }
  }

  test("property: funnel equals the greedy earliest-chain replay (same-instant steps admitted)") {
    val steps = Seq("view", "click", "purchase")
    (1 to 3).foreach { seed =>
      val log = randomLog(seed)
      val want = log.groupBy(_.userId).flatMap { case (u, evs) =>
        def earliest(step: String, atOrAfter: Long): Option[Long] = {
          val c = evs.filter(e => e.eventType == step && toUs(e.ts) >= atOrAfter)
          if (c.isEmpty) None else Some(c.map(e => toUs(e.ts)).min)
        }
        earliest(steps.head, Long.MinValue).map { t1 =>
          val t2 = earliest(steps(1), t1)
          val t3 = t2.flatMap(earliest(steps(2), _))
          u -> ((Some(t1), t2, t3))
        }
      }
      val got = Events.funnel(df(log), steps).collect().map { r =>
        def t(i: Int) = Option(r.getTimestamp(i)).map(toUs)
        r.getLong(0) -> ((t(1), t(2), t(3)))
      }.toMap
      assert(got === want, s"seed $seed: funnels differ")
    }
  }

  test("property: cohort retention equals a naive ISO-week replay") {
    (1 to 3).foreach { seed =>
      val log = randomLog(seed)
      def week(t: Timestamp) = t.toInstant.atZone(ZoneOffset.UTC).toLocalDate
        .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
      val cohorts = log.filter(_.eventType == "signup").groupBy(_.userId)
        .map { case (u, es) => u -> week(es.minBy(e => toUs(e.ts)).ts) }
      val want = log.flatMap(e => cohorts.get(e.userId).map(cw => (e.userId, cw, week(e.ts))))
        .distinct
        .filter { case (_, cw, aw) => !aw.isBefore(cw) }
        .groupBy { case (_, cw, aw) =>
          (cw, (java.time.temporal.ChronoUnit.DAYS.between(cw, aw) / 7).toInt)
        }
        .map { case ((cw, off), us) => (cw.toString, off) -> us.size.toLong }
      val got = Events.retentionCohorts(df(log)).collect().map { r =>
        (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)
      }.toMap
      assert(got === want, s"seed $seed: retention triangles differ")
    }
  }

  test("rollingAnomaly raises loudly past its exactness ceilings instead of silently un-flagging") {
    // under ANSI (the Spark-4 default) the decimal overflow itself
    // raises before the guard's CASE evaluates; under non-ANSI
    // sessions the overflow NULLs and the raise_error guard fires —
    // either way the operator is LOUD, never a silent no-flag
    def loud(e: Exception, guardMsg: String): Unit =
      assert(e.getMessage.contains(guardMsg) ||
        e.getMessage.contains("cannot be represented as Decimal") ||
        e.getMessage.contains("NUMERIC_VALUE_OUT_OF_RANGE"),
        s"unexpected error: ${e.getMessage}")
    def log(value: Double, rows: Int): org.apache.spark.sql.DataFrame = {
      val t0 = Timestamp.valueOf("2026-03-02 00:00:00").getTime
      (0 until rows).map(i =>
          (i.toLong, 1L, "m", new Timestamp(t0 + i * 1000L), value))
        .toDF("event_id", "user_id", "event_type", "ts", "value")
    }
    // |value| >= 1e12 cannot quantize into DECIMAL(18,6) micros —
    // pre-r11 a non-ANSI session NULLed the row out of every later
    // baseline frame
    loud(intercept[Exception] {
      Events.rollingAnomaly(log(5.0e12, 10)).collect()
    }, "too large to quantize")
    // n·Σm² past DECIMAL(38,0) (n=100, |value|≈9e11 → Σm ≈ 9e19,
    // (Σm)² ≈ 8.1e39) — pre-r11 the DECIMAL(36,0) cast NULLed the
    // variance and the flag silently stayed false (non-ANSI)
    loud(intercept[Exception] {
      Events.rollingAnomaly(log(9.0e11, 120), n = 100).collect()
    }, "variance numerator exceeds")
    // in-contract values still pass clean: constant baseline ⇒ exact
    // zero variance, no flag, no error
    val ok = Events.rollingAnomaly(log(123.45, 20)).collect()
    assert(ok.length === 20 && ok.forall(!_.getAs[Boolean]("is_anomaly")))
    // n > 999 overflows the DECIMAL(3,0) n_prior factor — refuse with
    // the REAL ceiling named, not a misattributed variance raise (r11
    // advice)
    val big = intercept[IllegalArgumentException] {
      Events.rollingAnomaly(log(1.0, 10), n = 1000)
    }
    assert(big.getMessage.contains("up to n = 999"))
  }
}
