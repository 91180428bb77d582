package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  test("asOfJoin backward: nearest-at-or-before, inclusive, tolerance, tie-break") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 50L, "d"))
      .toDF("k", "lt", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 18L, 200L), (2L, 10L, 300L))
      .toDF("k", "rt", "v")
    val got = TemporalJoins.asOfJoin(left, right, Seq("k"), "lt", "rt")
      .select("k", "lt", "tag", "rt", "v")
      .as[(Long, Long, String, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 10L, "a", Some(10L), Some(100L)), // equal time matches (inclusive)
      (1L, 20L, "b", Some(18L), Some(200L)), // nearest at-or-before
      (1L, 5L, "c", None, None),             // nothing before -> null
      (2L, 50L, "d", Some(10L), Some(300L))))
    // tolerance nulls the stale match but keeps the left row
    val tol = TemporalJoins.asOfJoin(left, right, Seq("k"), "lt", "rt",
        tolerance = Some(lit(5L)))
      .select("k", "lt", "rt").as[(Long, Long, Option[Long])].collect().toSet
    assert(tol == Set((1L, 10L, Some(10L)), (1L, 20L, Some(18L)),
      (1L, 5L, None), (2L, 50L, None)))
    // right rows tying on time: max payload tuple wins backward
    val dupR = Seq((1L, 10L, 7L), (1L, 10L, 9L)).toDF("k", "rt", "v")
    val dup = TemporalJoins.asOfJoin(Seq((1L, 11L)).toDF("k", "lt"), dupR,
        Seq("k"), "lt", "rt")
      .select("v").as[Long].collect().toSeq
    assert(dup == Seq(9L))
  }

  test("asOfJoin forward: nearest-at-or-after, tolerance, min tie-break") {
    val left = Seq((1L, 10L), (1L, 19L), (1L, 30L)).toDF("k", "lt")
    val right = Seq((1L, 12L, 100L), (1L, 19L, 200L)).toDF("k", "rt", "v")
    val got = TemporalJoins.asOfJoin(left, right, Seq("k"), "lt", "rt",
        forward = true)
      .select("lt", "rt", "v")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (10L, Some(12L), Some(100L)),
      (19L, Some(19L), Some(200L)), // inclusive
      (30L, None, None)))           // nothing after
    val tol = TemporalJoins.asOfJoin(left, right, Seq("k"), "lt", "rt",
        tolerance = Some(lit(1L)), forward = true)
      .select("lt", "rt").as[(Long, Option[Long])].collect().toSet
    assert(tol == Set((10L, None), (19L, Some(19L)), (30L, None)))
    val dupR = Seq((1L, 12L, 7L), (1L, 12L, 9L)).toDF("k", "rt", "v")
    val dup = TemporalJoins.asOfJoin(Seq((1L, 10L)).toDF("k", "lt"), dupR,
        Seq("k"), "lt", "rt", forward = true)
      .select("v").as[Long].collect().toSeq
    assert(dup == Seq(7L))
  }

  test("asOfJoin agrees with the quadratic reference model on a dense fixture") {
    // Deterministic pseudo-random fixture: many per-key collisions and
    // exact left/right time ties, the cases where sweep order matters.
    val lrows = (0 until 300).map(i => (i % 7L, (i * 13) % 50L, i.toLong))
    val rrows = (0 until 200).map(i => ((i * 3) % 7L, (i * 11) % 50L, i * 10L))
    val left = lrows.toDF("k", "lt", "lid")
    val right = rrows.toDF("k", "rt", "v")
    def model(forward: Boolean): Set[(Long, Long, Long, Option[Long], Option[Long])] =
      lrows.map { case (k, lt, lid) =>
        val cand = rrows.filter(r => r._1 == k &&
          (if (forward) r._2 >= lt else r._2 <= lt))
        val best =
          if (cand.isEmpty) None
          else if (forward) Some(cand.minBy(r => (r._2, r._3)))
          else Some(cand.maxBy(r => (r._2, r._3)))
        (k, lt, lid, best.map(_._2), best.map(_._3))
      }.toSet
    for (fwd <- Seq(false, true)) {
      val got = TemporalJoins.asOfJoin(left, right, Seq("k"), "lt", "rt",
          forward = fwd)
        .select("k", "lt", "lid", "rt", "v")
        .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSet
      assert(got == model(fwd), s"forward=$fwd")
    }
  }

  test("intervalJoin: binned equals broadcast, boundary semantics, multi-bin spans") {
    // Intervals overlap, span multiple 10 s bins, and end exactly on bin
    // edges; points sit on starts (included) and ends (excluded).
    val ivs = Seq((1L, 100L, 130L, "i1"), (1L, 115L, 120L, "i2"),
      (1L, 200L, 210L, "i3"), (2L, 100L, 130L, "i4"))
      .map { case (k, s, e, n) => (k, s, e, n) }.toDF("k", "s_sec", "e_sec", "iv")
      .select($"k", timestamp_seconds($"s_sec").as("start_ts"),
        timestamp_seconds($"e_sec").as("end_ts"), $"iv")
    val pts = (Seq((1L, 100L), (1L, 115L), (1L, 119L), (1L, 120L), (1L, 129L),
      (1L, 130L), (1L, 205L), (2L, 129L), (2L, 131L)))
      .toDF("k", "p_sec")
      .select($"k", timestamp_seconds($"p_sec").as("pt"), $"p_sec")
    def run(bin: Option[Long]) = TemporalJoins.intervalJoin(
        pts, "pt", ivs, "start_ts", "end_ts", Seq("k"), bin)
      .select("k", "p_sec", "iv").as[(Long, Long, String)].collect().toSet
    val broad = run(None)
    assert(broad == Set(
      (1L, 100L, "i1"), (1L, 115L, "i1"), (1L, 115L, "i2"), (1L, 119L, "i1"),
      (1L, 119L, "i2"), (1L, 120L, "i1"), (1L, 129L, "i1"), (1L, 205L, "i3"),
      (2L, 129L, "i4"))) // 130 excluded (end-exclusive), 131 out, key 2 split
    assert(run(Some(10L)) == broad)
    assert(run(Some(7L)) == broad)   // bin width not dividing the edges
    assert(run(Some(1000L)) == broad) // all rows in one bin
  }

  test("spikeEvents: spike detection, adjacent-minute merge, threshold invariant") {
    // Planted stream: background of one event per minute, a 3-minute
    // burst (10/min) at minutes 100-102 and an isolated burst at 500.
    val rows = (0 until 600).map(i => (i.toLong, i * 60L, 1L)) ++
      (0 until 30).map(i => (1000L + i, (100 + i / 10) * 60L + (i % 10), 2L)) ++
      (0 until 12).map(i => (2000L + i, 500 * 60L + i, 3L))
    val ev = rows.toDF("event_id", "sec", "user_id")
      .select($"event_id", timestamp_seconds($"sec").as("ts"), $"user_id")
    val ivs = TemporalJoins.spikeIntervalsFrom(ev)
    val got = ivs.as[(java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSet
    def t(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    // mean = 642/600 = 1.07; burst minutes carry 11 resp 13 events
    assert(got == Set((t(100 * 60), t(103 * 60), 3L), (t(500 * 60), t(501 * 60), 1L)))
    // threshold invariant: every interval's per-minute rate beats
    // SpikeFactor x the global mean
    val joined = TemporalJoins.intervalJoin(ev.select("ts", "user_id"), "ts",
        ivs, "spike_start", "spike_end", binSeconds = Some(60))
      .groupBy("spike_start", "spike_end", "n_minutes")
      .agg(count(lit(1)).as("n_events"))
      .collect()
    val total = rows.length.toLong
    val nMinutes = 600L
    joined.foreach { r =>
      assert(r.getAs[Long]("n_events") * nMinutes >
        TemporalJoins.SpikeFactor * total * r.getAs[Long]("n_minutes"))
    }
  }

  test("spikeEvents: binned path equals broadcast path on the sf corpus") {
    val viaBroadcast = TemporalJoins.intervalJoin(
        Tables.events(spark, sf).select("ts", "user_id"), "ts",
        TemporalJoins.spikeIntervals(spark, sf),
        "spike_start", "spike_end", binSeconds = None)
      .groupBy("spike_start", "spike_end", "n_minutes")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"))
      .collect().toSet
    val got = TemporalJoins.spikeEvents(spark, sf).collect().toSet
    assert(got == viaBroadcast) // may both be empty at sf0.001 density
  }

  test("point-in-time features: served row is the last closed window, TTL nulls") {
    val got = TemporalJoins.pointInTimeFeatures(spark, sf)
    val rows = got.collect()
    val clicks = Tables.events(spark, sf)
      .filter($"event_type" === "click").count()
    assert(rows.length == clicks) // left-outer: every click kept
    rows.foreach { r =>
      val age = Option(r.getAs[Long]("feat_age_sec"))
      if (!r.isNullAt(r.fieldIndex("feat_end"))) {
        // snapshot strictly precedes-or-meets the click and is fresh
        assert(!r.getAs[java.sql.Timestamp]("feat_end")
          .after(r.getAs[java.sql.Timestamp]("click_ts")))
        assert(age.get >= 0 && age.get <= TemporalJoins.FeatureTtlMinutes * 60L)
      } else assert(age.isEmpty)
    }
    // spot-check one matched click against a direct window recomputation
    val m = rows.find(r => !r.isNullAt(r.fieldIndex("feat_end"))).get
    val direct = FeatureJobs.windowedFeatures(spark, sf, "5 minutes")
      .filter($"user_id" === m.getAs[Long]("user_id") &&
        $"window_end" === m.getAs[java.sql.Timestamp]("feat_end"))
      .select("clicks", "views").as[(Long, Long)].collect().toSeq
    assert(direct == Seq((m.getAs[Long]("feat_clicks"), m.getAs[Long]("feat_views"))))
  }

  private def writeEvents(prefix: String,
      rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select($"event_id", timestamp_seconds($"sec").as("ts"), $"user_id",
        $"event_type", $"value", lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel: chained stages honor order and horizon; stage counts hand-checked") {
    val h = TemporalJoins.FunnelHorizonHours * 3600L
    val dir = writeEvents("funnel", Seq(
      // user 1: full funnel inside the horizon
      (1L, 100L, 1L, "view", 0.0), (2L, 200L, 1L, "click", 0.0),
      (3L, 300L, 1L, "purchase", 5.0),
      // user 2: converts to click, purchase arrives too late
      (4L, 100L, 2L, "view", 0.0), (5L, 200L, 2L, "click", 0.0),
      (6L, 200L + h + 1, 2L, "purchase", 5.0),
      // user 3: view only; purchase BEFORE the click never counts
      (7L, 100L, 3L, "purchase", 5.0), (8L, 200L, 3L, "view", 0.0),
      // user 4: two views share the same next click (both convert),
      // and the click's purchase sits exactly on the horizon edge
      (9L, 100L, 4L, "view", 0.0), (10L, 150L, 4L, "view", 0.0),
      (11L, 400L, 4L, "click", 0.0), (12L, 400L + h, 4L, "purchase", 5.0)))
    val got = TemporalJoins.funnelStages(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // views: 5 (users 1,2,3,4x2); clicked: 4 (user 3's view has no
    // click); purchased: 3 (user 1, user 4 twice — edge inclusive;
    // user 2 too late); users: 4 / 3 / 2
    assert(got == Seq((5L, 4L, 3L, 4L, 3L, 2L)), got.toString)
  }

  test("revenue attribution: lookback window, cents quantization, daily split") {
    val lb = TemporalJoins.AttributionLookbackHours * 3600L
    val day = 86400L
    val dir = writeEvents("revatt", Seq(
      (1L, 100L, 1L, "click", 0.0),
      (2L, 200L, 1L, "purchase", 1.005),          // attributed, 100 cents
      (3L, 100L + lb + day, 1L, "purchase", 2.0), // next day, no click in window
      (4L, day + 50L, 2L, "purchase", 3.555),     // never clicked, 356 cents
      (5L, day + 60L, 2L, "click", 0.0)))         // click AFTER purchase: ignored
    val got = TemporalJoins.revenueAttribution(spark, dir)
      .select("n_purchases", "n_attributed", "revenue_cents", "attributed_cents")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // day 0: the attributed 1.005 purchase quantizes DOWN (IEEE:
    // 1.005*100 = 100.4999... -> 100 cents) while day 1's 3.555 rounds
    // UP (355.5 exactly representable -> 356) - both engines agree
    // because the arithmetic is the same binary64 either side
    assert(got == Seq((1L, 1L, 100L, 100L), (2L, 0L, 556L, 0L)), got.toString)
  }

  test("funnel and attribution invariants on the sf corpus") {
    val f = TemporalJoins.funnelStages(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(f._1 >= f._2 && f._2 >= f._3, f.toString) // events monotone
    assert(f._4 >= f._5 && f._5 >= f._6, f.toString) // users monotone
    assert(f._2 >= f._5 && f._3 >= f._6, f.toString) // events >= users
    val r = TemporalJoins.revenueAttribution(spark, sf).collect()
    r.foreach { row =>
      assert(row.getAs[Long]("attributed_cents") <= row.getAs[Long]("revenue_cents"))
      assert(row.getAs[Long]("n_attributed") <= row.getAs[Long]("n_purchases"))
    }
  }

  test("time-to-conversion: delays non-negative and within the horizon") {
    val rows = TemporalJoins.timeToConversion(spark, sf).collect()
    val views = Tables.events(spark, sf)
      .filter($"event_type" === "view").count()
    assert(rows.length == views)
    val matched = rows.filter(r => !r.isNullAt(r.fieldIndex("click_ts")))
    assert(matched.nonEmpty)
    matched.foreach { r =>
      val d = r.getAs[Long]("to_click_sec")
      assert(d >= 0 && d <= TemporalJoins.ConversionHorizonHours * 3600L)
    }
  }
}
