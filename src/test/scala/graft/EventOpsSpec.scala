package graft

import graft.ops.EventOps
import java.sql.Timestamp

/** Sessionization and funnel: hand-audited boundary semantics. */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("sessionize: exact-gap event MERGES (touching windows); bounds are [first, last+gap)") {
    // user 1 (gap 30): 0/10 together; 40 at EXACTLY 10+30 merges (Spark
    // session_window merges touching windows); 71 is > 40+30 → new session
    val ev = Seq(
      (0L, ts(0), 1L, "a", 1.0, "{}"), (1L, ts(10), 1L, "a", 2.0, "{}"),
      (2L, ts(40), 1L, "a", 4.0, "{}"), (4L, ts(71), 1L, "a", 16.0, "{}"),
      (3L, ts(5), 2L, "a", 8.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.sessionize(ev, 30).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getInt(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, ts(0), ts(70), 3, 7.0),   // end = 40 + 30
      (1L, ts(71), ts(101), 1, 16.0),
      (2L, ts(5), ts(35), 1, 8.0)), s"got ${got.toSeq}")
    intercept[IllegalArgumentException](EventOps.sessionize(ev, 0))
  }

  test("funnel: strictly-after anchor; window flag; missing steps") {
    val ev = Seq(
      // u1: signup @10, purchase @20 (within 1h) → converted
      (0L, ts(10), 1L, "signup", 0.0, "{}"), (1L, ts(20), 1L, "purchase", 0.0, "{}"),
      // u2: purchase BEFORE signup only → b_ts NULL, not converted
      (2L, ts(5), 2L, "purchase", 0.0, "{}"), (3L, ts(10), 2L, "signup", 0.0, "{}"),
      // u3: purchase 2h after signup, window 1h → b_ts set, NOT converted
      (4L, ts(0), 3L, "signup", 0.0, "{}"), (5L, ts(120), 3L, "purchase", 0.0, "{}"),
      // u4: purchase at exactly signup ts → excluded (strictly after)
      (6L, ts(30), 4L, "signup", 0.0, "{}"), (7L, ts(30), 4L, "purchase", 0.0, "{}"),
      // u5: no signup → absent
      (8L, ts(0), 5L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.funnel(ev, "signup", "purchase", 1).collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(2)), r.getBoolean(3))).toSeq
    assert(got == Seq(
      (1L, Some(ts(20)), true),
      (2L, None, false),
      (3L, Some(ts(120)), false),
      (4L, None, false)), s"got $got")
  }
}
