package graft.analytics

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventOpsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("rateAnomalies: exact spike verdict vs trailing mean, null before " +
    "a full baseline, gap days age the window as zeros") {
    def day(d: Int, i: Int) = (d * 100L + i,
      ts(f"2026-01-${d + 1}%02d 12:00:00"), 1L, "a", 1.0)
    // type a: 2 events/day on days 0..6, then 5 events on day 7
    val a = (0 to 6).flatMap(d => Seq(day(d, 0), day(d, 1))) ++
      (0 until 5).map(i => day(7, i))
    // type g: burst on day 0, silence, one event on day 10
    val g = Seq((9000L, ts("2026-01-01 12:00:00"), 2L, "g", 1.0),
      (9001L, ts("2026-01-11 12:00:00"), 2L, "g", 1.0))
    val events = (a ++ g)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.analytics.EventOps.rateAnomalies(events, "event_type",
      "ts", windowDays = 7, factorNum = 3, factorDen = 2)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[String]("day")) ->
        (r.getAs[Long]("n"), Option(r.getAs[java.lang.Double]("trailing_mean")),
          Option(r.getAs[java.lang.Boolean]("spike")))).toMap
    // days 0..6: under 7 days of history → null verdict
    (1 to 7).foreach { d =>
      assert(out(("a", f"2026-01-$d%02d"))._3 === None)
    }
    // day 7: trailing sum 14, mean 2.0; 5 > 1.5×2 → spike
    assert(out(("a", "2026-01-08")) === ((5L, Some(2.0), Some(true))))
    // type g day 10: empty trailing window sums to 0 → spike after silence
    assert(out(("g", "2026-01-11")) === ((1L, Some(0.0), Some(true))))
    assert(out(("g", "2026-01-01"))._3 === None)
  }

  test("lastTouchAttribution: latest in-window touch wins, out-of-window " +
    "and touchless conversions stay visible unattributed, equal-ts ties " +
    "to larger id") {
    val events = Seq(
      // user 7: click then view then purchase — view is latest touch
      (1L, ts("2026-08-12 10:00:00"), 7L, "click", null.asInstanceOf[java.lang.Double]),
      (2L, ts("2026-08-12 10:30:00"), 7L, "view", null.asInstanceOf[java.lang.Double]),
      (3L, ts("2026-08-12 10:40:00"), 7L, "purchase", java.lang.Double.valueOf(9.99)),
      // user 8: touch 2h before purchase — outside the 1h window
      (4L, ts("2026-08-12 08:00:00"), 8L, "click", null.asInstanceOf[java.lang.Double]),
      (5L, ts("2026-08-12 10:00:00"), 8L, "purchase", java.lang.Double.valueOf(5.0)),
      // user 9: no touches at all
      (6L, ts("2026-08-12 10:00:00"), 9L, "purchase", java.lang.Double.valueOf(1.0)),
      // user 10: two touches at the SAME ts — larger event_id wins
      (7L, ts("2026-08-12 10:00:00"), 10L, "click", null.asInstanceOf[java.lang.Double]),
      (8L, ts("2026-08-12 10:00:00"), 10L, "view", null.asInstanceOf[java.lang.Double]),
      (9L, ts("2026-08-12 10:05:00"), 10L, "purchase", java.lang.Double.valueOf(2.0))
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.lastTouchAttribution(events, "user_id", "ts",
      "event_id", "event_type", "value", "purchase", Seq("click", "view"),
      windowSec = 3600)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[String]("touch_type")),
          Option(r.getAs[java.lang.Long]("touch_id")).map(_.toLong))).toMap
    assert(out(3L) === ((Some("view"), Some(2L))))
    assert(out(5L) === ((None, None)))     // out of window → unattributed
    assert(out(6L) === ((None, None)))     // no touch at all
    assert(out(9L) === ((Some("view"), Some(8L))))  // tie → larger id
    assert(out.size === 4)                 // every conversion present
  }

  test("sessionize: gap splits, ordinal ids, exact totals") {
    val events = Seq(
      (1L, ts("2026-08-12 10:00:00"), 7L, 1.5),
      (2L, ts("2026-08-12 10:10:00"), 7L, 2.5),   // same session (10 min)
      (3L, ts("2026-08-12 11:00:00"), 7L, 4.0),   // 50-min gap → new session
      (4L, ts("2026-08-12 09:00:00"), 8L, 1.0)    // other user
    ).toDF("event_id", "ts", "user_id", "value")
    val out = EventOps.sessionize(events, "user_id", "ts", "event_id", "value", 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getTimestamp(3), r.getTimestamp(4))).toMap
    assert(out((7L, 1L))._1 === 2L)
    assert(out((7L, 1L))._2 === ts("2026-08-12 10:00:00"))
    assert(out((7L, 1L))._3 === ts("2026-08-12 10:10:00"))
    assert(out((7L, 2L))._1 === 1L)
    assert(out((8L, 1L))._1 === 1L)
  }

  test("sessionize: boundary is strict — exactly gapSeconds stays in session") {
    val events = Seq(
      (1L, ts("2026-08-12 10:00:00"), 7L, 1.0),
      (2L, ts("2026-08-12 10:30:00"), 7L, 1.0),   // exactly 1800s → same
      (3L, ts("2026-08-12 11:00:01"), 7L, 1.0)    // 1801s → new
    ).toDF("event_id", "ts", "user_id", "value")
    val n = EventOps.sessionize(events, "user_id", "ts", "event_id", "value", 1800)
      .count()
    assert(n === 2)
  }

  test("rangeJoin: inclusive bounds across grain boundaries, entity isolation, equi-join plan") {
    val points = Seq(
      (1L, 7L, ts("2026-08-12 10:00:00")),  // == start (inclusive)
      (2L, 7L, ts("2026-08-12 10:07:30")),  // mid, different grain than start
      (3L, 7L, ts("2026-08-12 10:10:00")),  // == end (inclusive)
      (4L, 7L, ts("2026-08-12 10:10:01")),  // past end
      (5L, 8L, ts("2026-08-12 10:05:00"))   // other entity, same time range
    ).toDF("event_id", "user_id", "ts")
    val intervals = Seq(
      (7L, 100L, ts("2026-08-12 10:00:00"), ts("2026-08-12 10:10:00"))
    ).toDF("user_id", "iv_id", "start", "end")
    val joined = EventOps.rangeJoin(points, intervals, "user_id", "ts",
      "start", "end", grainSeconds = 60)
    val got = joined.select("event_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 3L))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("rangeJoin: grain choice is result-invariant; interval fan-out bounded by span/grain + 2") {
    // 50 points over 2 entities, intervals spanning 600s each
    val points = (1 to 50).map(i =>
      (i.toLong, (i % 2).toLong, ts(f"2026-08-12 10:${i % 60}%02d:00")))
      .toDF("event_id", "user_id", "ts")
    val intervals = Seq(
      (0L, 1L, ts("2026-08-12 10:05:00"), ts("2026-08-12 10:15:00")),
      (1L, 2L, ts("2026-08-12 10:20:00"), ts("2026-08-12 10:30:00"))
    ).toDF("user_id", "iv_id", "start", "end")
    def run(grain: Long) = EventOps.rangeJoin(points, intervals, "user_id",
      "ts", "start", "end", grain)
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSet
    // the grain trades interval replication against residual-filter work,
    // never the answer: coarse (1 grain/interval) == fine (61 grains)
    assert(run(3600) === run(10))
    assert(run(600) === run(10))
    // the replication bound itself, over the same bucketing arithmetic the
    // operator uses: an interval of span s explodes to at most s/g + 2
    // grains (+2: both ends can straddle grain boundaries)
    for (g <- Seq(10L, 600L, 3600L)) {
      val gUs = g * 1000000L
      val maxFan = intervals.select(
        (unix_micros(col("end")).divide(gUs).cast("long") -
          unix_micros(col("start")).divide(gUs).cast("long") + 1L).as("n"))
        .agg(max(col("n"))).as[Long].head()
      assert(maxFan <= 600L / g + 2, s"grain $g fan-out $maxFan")
    }
  }

  test("asofJoin: latest prior-or-equal right row, ties to larger id, no match → null") {
    val purchases = Seq(
      (100L, 7L, ts("2026-08-12 10:00:00"), 9.9),
      (101L, 7L, ts("2026-08-12 12:00:00"), 8.8),
      (102L, 8L, ts("2026-08-12 10:00:00"), 7.7)   // user with no views
    ).toDF("event_id", "user_id", "ts", "value")
    val views = Seq(
      (7L, ts("2026-08-12 09:00:00"), 10L, 1.0),
      (7L, ts("2026-08-12 10:00:00"), 11L, 2.0),   // equal ts → visible
      (7L, ts("2026-08-12 10:00:00"), 12L, 3.0),   // tie → larger id wins
      (7L, ts("2026-08-12 13:00:00"), 13L, 4.0)    // after both purchases
    ).toDF("user_id", "ts", "event_id", "value")
    val out = EventOps.asofJoin(purchases, views, "user_id", "ts", "event_id",
      Seq("value"), "view_")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(4)).map(_.asInstanceOf[Double])).toMap
    assert(out(100L) === Some(3.0)) // equal-ts view, tie-broken to id 12
    assert(out(101L) === Some(3.0)) // still the latest at 12:00
    assert(out(102L) === None)      // left join: no view for user 8
  }

  test("NTZ robustness: sessionize/rangeJoin/asofJoin run unchanged on " +
    "TIMESTAMP_NTZ parquet input") {
    // The driver regenerates testdata between rounds; round 7's regen
    // switched events.ts to no-TZ parquet timestamps, which Spark 4 infers
    // as TIMESTAMP_NTZ — and `unix_micros` rejects NTZ at ANALYSIS time, so
    // sessionize and rangeJoin silently vanished from a whole correctness
    // round. This pins the contract: every EventOps operator must accept
    // both flavors and (session TZ = UTC) produce identical results.
    val dir = java.nio.file.Files.createTempDirectory("ntz_events").toString
    val events = Seq(
      (1L, ts("2026-08-12 10:00:00"), 7L, 1.5),
      (2L, ts("2026-08-12 10:10:00"), 7L, 2.5),
      (3L, ts("2026-08-12 11:00:00"), 7L, 4.0),
      (4L, ts("2026-08-12 09:00:00"), 8L, 1.0)
    ).toDF("event_id", "ts", "user_id", "value")
    events.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events")
    val ntz = spark.read.parquet(s"$dir/events")
    assert(ntz.schema("ts").dataType.typeName === "timestamp_ntz")

    val sess = EventOps.sessionize(ntz, "user_id", "ts", "event_id", "value", 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sess === Map((7L, 1L) -> 2L, (7L, 2L) -> 1L, (8L, 1L) -> 1L))

    val intervals = Seq((7L, 100L, ts("2026-08-12 09:55:00"), ts("2026-08-12 10:15:00")))
      .toDF("user_id", "iv_id", "start", "end")
      .select(col("user_id"), col("iv_id"),
        col("start").cast("timestamp_ntz").as("start"),
        col("end").cast("timestamp_ntz").as("end"))
    val ranged = EventOps.rangeJoin(ntz.select("event_id", "user_id", "ts"),
      intervals, "user_id", "ts", "start", "end", grainSeconds = 60)
      .select("event_id").as[Long].collect().toSet
    assert(ranged === Set(1L, 2L))

    val asof = EventOps.asofJoin(
      ntz.filter(col("user_id") === 7L).select("event_id", "user_id", "ts"),
      ntz.select(col("user_id"), col("ts"), col("event_id"), col("value")),
      "user_id", "ts", "event_id", Seq("value"), "prev_")
    assert(asof.count() === 3)
  }

  test("asofJoin: NULL payload fields stay NULL and all payload columns " +
    "come from the single matched row") {
    val left = Seq((100L, 7L, ts("2026-08-12 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      // older row: both payloads set — must NOT leak into the result
      (7L, ts("2026-08-12 09:00:00"), 10L, Some(1.0), Some("old")),
      // most recent prior row: one NULL payload, one set
      (7L, ts("2026-08-12 10:00:00"), 11L, None, Some("new"))
    ).toDF("user_id", "ts", "event_id", "a", "b")
    val row = EventOps.asofJoin(left, right, "user_id", "ts", "event_id",
      Seq("a", "b"), "r_").head()
    // a per-column last(..., ignoreNulls) would return (1.0, "new") —
    // column a from the older row, column b from the newer: torn row
    assert(row.isNullAt(row.fieldIndex("r_a")))
    assert(row.getString(row.fieldIndex("r_b")) === "new")
  }

  test("funnel: earliest ordered chain, strict ordering, broken chains " +
    "leave null tails, entry step required") {
    val events = Seq(
      // user 1: full conversion, but the earliest click precedes the view
      // and must NOT count — t2 is the 10:20 click, t3 the 10:30 purchase
      (1L, "click", ts("2026-08-12 09:00:00")),
      (2L, "view", ts("2026-08-12 10:00:00")),
      (3L, "click", ts("2026-08-12 10:20:00")),
      (4L, "purchase", ts("2026-08-12 10:30:00")),
      // user 2: view then purchase with NO intervening click — chain
      // breaks at step 2 even though a purchase exists
      (5L, "view", ts("2026-08-12 10:00:00")),
      (6L, "purchase", ts("2026-08-12 11:00:00")),
      // user 3: never viewed → not in the funnel at all
      (7L, "click", ts("2026-08-12 10:00:00"))
    ).map { case (id, t, w) => (id, t, w, 9L) }
      .toDF("event_id", "event_type", "ts", "user_id")
      .withColumn("user_id",
        when(col("event_id") <= 4, 1L).when(col("event_id") <= 6, 2L)
          .otherwise(3L))
    val out = EventOps.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3)), r.getInt(4))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((Some(ts("2026-08-12 10:00:00")),
      Some(ts("2026-08-12 10:20:00")), Some(ts("2026-08-12 10:30:00")), 3)))
    assert(out(2L) === ((Some(ts("2026-08-12 10:00:00")), None, None, 1)))
  }

  test("retentionCohorts: integer day buckets from the anchor, users " +
    "counted once per (cohort, age) cell") {
    val events = Seq(
      (1L, 10L, ts("2024-01-02 10:00:00")), // user 10: cohort bucket 0
      (2L, 10L, ts("2024-01-09 10:00:00")), // active again in bucket 1
      (3L, 10L, ts("2024-01-10 10:00:00")), // same bucket — counted once
      (4L, 20L, ts("2024-01-09 10:00:00")), // user 20: cohort bucket 1
      (5L, 30L, ts("2024-01-02 10:00:00"))  // user 30: cohort 0, one visit
    ).toDF("event_id", "user_id", "ts")
    val out = EventOps.retentionCohorts(events, "user_id", "ts",
      "2024-01-01", bucketDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (1L, 0L) -> 1L))
  }
}
