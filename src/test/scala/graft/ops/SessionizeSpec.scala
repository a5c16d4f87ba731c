package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("gap-based sessionization splits exactly at the gap and numbers 1-based") {
    import spark.implicits._
    // user 1: events at 0, 10, 20 min (one session), then 60, 65 (second),
    // user 2: single event
    val events = Seq(
      (1L, 100L, ts(0)), (1L, 101L, ts(10)), (1L, 102L, ts(20)),
      (1L, 103L, ts(60)), (1L, 104L, ts(65)),
      (2L, 200L, ts(5))
    ).toDF("user_id", "event_id", "ts")
    val out = Sessionize.sessions(events, gapMs = 30L * 60 * 1000)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getTimestamp(3), r.getTimestamp(4))).toMap
    assert(out((1L, 1)) == ((3L, ts(0), ts(20))))
    assert(out((1L, 2)) == ((2L, ts(60), ts(65))))
    assert(out((2L, 1)) == ((1L, ts(5), ts(5))))
    assert(out.size == 3)
  }

  test("boundary: a gap of exactly gapMs stays in the same session") {
    import spark.implicits._
    val events = Seq((1L, 1L, ts(0)), (1L, 2L, ts(30))).toDF("user_id", "event_id", "ts")
    val out = Sessionize.sessions(events, gapMs = 30L * 60 * 1000).collect()
    assert(out.length == 1 && out.head.getLong(2) == 2L)
  }
}
