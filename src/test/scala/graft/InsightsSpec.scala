package graft

import org.apache.spark.sql.functions._

class InsightsSpec extends SparkSuite {

  test("assoc_rules: top pairs match a driver-side brute-force count") {
    val lp = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val baskets = lp.groupBy(_._1).values
      .map(_.map(_._2).distinct.sorted.toIndexedSeq)
      .filter(b => b.length > 1 && b.length <= 64)
    val pairCount = baskets.toSeq
      .flatMap(b => for (i <- b.indices; j <- i + 1 until b.length) yield (b(i), b(j)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 2L)
    val itemCount = lp.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val n = lp.map(_._1).distinct.size.toLong
    val expect = pairCount.toSeq
      .sortBy { case ((u, v), c) => (-c, u, v) }.take(100)
    val rows = graft.queries.Insights.assocRules(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length == expect.size)
    rows.zip(expect).foreach { case (r, ((u, v), c)) =>
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (u, v, c))
      assert(r.getLong(3) == itemCount(u) && r.getLong(4) == itemCount(v))
      assert(r.getLong(5) == c * 10000L / n)
      assert(r.getLong(6) == c * 10000L / itemCount(u))
      assert(r.getLong(7) == c * 10000L / itemCount(v))
      assert(r.getLong(8) == c * n * 1000000L / (itemCount(u) * itemCount(v)))
    }
  }

  test("assoc_rules plan: top-100 is a TakeOrdered, no cartesian product") {
    val plan = graft.queries.Insights.assocRules(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("ohlc_bars: open/close/high/low equal per-bucket recomputation") {
    val ev = graft.streaming.Sessions.events(spark, sf0001)
      .selectExpr("event_type", "ts_ms",
        "event_id", "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = ev.groupBy { case (t, ms, _, _) => (t, ms / 3600000L * 3600000L) }
      .map { case (k, xs) =>
        val sorted = xs.sortBy { case (_, ms, id, _) => (ms, id) }
        k -> (sorted.head._4, xs.map(_._4).max, xs.map(_._4).min,
          sorted.last._4, xs.length.toLong, xs.map(_._4).sum)
      }
    val rows = graft.queries.Insights.ohlcBars(spark, sf0001).collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (o, h, l, c, nE, v) = expect((r.getString(0), r.getLong(1)))
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)) == (o, h, l, c, nE, v), r.toString)
    }
  }

  test("ohlc_bars plan: one aggregate, no window, no join") {
    val plan = graft.queries.Insights.ohlcBars(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan.take(800))
    assert(!plan.contains("Join"), plan.take(800))
  }

  test("ab_chisq: contingency counts and statistic match recomputation") {
    val ev = graft.streaming.Sessions.events(spark, sf0001)
      .select(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nA = ev.count(_._1 % 2 == 0).toLong
    val xA = ev.count(e => e._1 % 2 == 0 && e._2 == "purchase").toLong
    val nB = ev.count(_._1 % 2 == 1).toLong
    val xB = ev.count(e => e._1 % 2 == 1 && e._2 == "purchase").toLong
    val chi2 = (nA + nB).toDouble *
      math.pow(xA.toDouble * (nB - xB).toDouble - xB.toDouble * (nA - xA).toDouble, 2) /
      (nA.toDouble * nB.toDouble * (xA + xB).toDouble * (nA + nB - xA - xB).toDouble)
    val r = graft.queries.Insights.abChisq(spark, sf0001).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == (nA, xA, nB, xB))
    assert(r.getLong(4) == xA * 10000L / nA && r.getLong(5) == xB * 10000L / nB)
    assert(math.abs(r.getDouble(6) - chi2) < 1e-6)
    assert(xA > 0 && xA < nA, "test corpus must have a non-degenerate contingency")
  }

  test("rolling_active_users: WAU equals naive 7-day window distinct") {
    val ev = graft.streaming.Sessions.events(spark, sf0001)
      .selectExpr("user_id", "ts_ms div 86400000 AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val rows = graft.queries.Insights.rollingActiveUsers(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == ev.map(_._2).distinct.sorted.toSeq)
    rows.foreach { r =>
      val day = r.getLong(0)
      val dau = ev.filter(_._2 == day).map(_._1).distinct.length.toLong
      val wau = ev.filter(e => e._2 >= day - 6 && e._2 <= day)
        .map(_._1).distinct.length.toLong
      assert((r.getLong(1), r.getLong(2)) == (dau, wau), s"day $day")
    }
    // the window must actually widen somewhere, or the test proves nothing
    assert(rows.exists(r => r.getLong(2) > r.getLong(1)))
  }

  test("benford_test: digit counts and expectation constants recompute") {
    val cents = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("CAST(round(o_totalprice * 100) AS BIGINT) AS c")
      .collect().map(_.getLong(0))
    val byDigit = cents.groupBy(_.toString.head.asDigit).view.mapValues(_.length.toLong)
    val rows = graft.queries.Insights.benfordTest(spark, sf0001).collect()
    assert(rows.map(_.getInt(0)).toSeq == byDigit.keys.toSeq.sorted)
    rows.foreach { r =>
      val d = r.getInt(0)
      assert(r.getLong(1) == byDigit(d))
      assert(r.getLong(2) == byDigit(d) * 10000L / cents.length)
      assert(r.getLong(3) ==
        math.round(math.log(1.0 + 1.0 / d) / math.log(10.0) * 10000))
    }
    assert(math.abs(rows.map(_.getLong(3)).sum - 10000L) <= 5L,
      "Benford expectations must sum to ~10000 bp")
  }

  test("weekday_index: per-weekday aggregates and index recompute") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000 AS day",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => ((r.getLong(0) + 4) % 7, r.getLong(1)))
    val avgAll = o.map(_._2).sum / o.length
    val rows = graft.queries.Insights.weekdayIndex(spark, sf0001).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val g = o.filter(_._1 == r.getLong(0)).map(_._2)
      assert(r.getLong(1) == g.length.toLong && r.getLong(2) == g.sum)
      assert(r.getLong(3) == g.sum / g.length)
      assert(r.getLong(4) == (g.sum / g.length) * 10000L / avgAll)
    }
  }

  test("trend_7d: centered value-range average matches a driver-side window") {
    val daily = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000 AS day",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val rows = graft.queries.Insights.trend7d(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == daily.keys.toSeq.sorted)
    rows.foreach { r =>
      val day = r.getLong(0)
      val win = daily.filter { case (d2, _) => math.abs(d2 - day) <= 3 }.values
      val trend = win.sum / win.size
      assert(r.getLong(1) == daily(day))
      assert(r.getLong(2) == trend, s"day $day")
      assert(r.getLong(3) == daily(day) - trend)
    }
  }

  test("quantile_transform: ranks are uniform bp under the declared tie-break") {
    val spend = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }.toSeq
    val ranked = spend.sortBy { case (ck, c) => (-c, ck) }.zipWithIndex
      .map { case ((ck, c), i) => ck -> (c, i.toLong * 10000L / (spend.size - 1)) }
      .toMap
    val rows = graft.queries.Insights.quantileTransform(spark, sf0001).collect()
    assert(rows.length == spend.size)
    rows.foreach { r =>
      val (c, q) = ranked(r.getLong(0))
      assert((r.getLong(1), r.getLong(2)) == (c, q), s"cust ${r.getLong(0)}")
    }
    // endpoints hit exactly 0 and 10000 bp
    assert(rows.map(_.getLong(2)).min == 0L && rows.map(_.getLong(2)).max == 10000L)
  }

  test("quantile_transform plan: the rank is distributed (no window)") {
    val plan = graft.queries.Insights.quantileTransform(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan.take(800))
  }

  test("conversion_lag: histogram matches a driver-side funnel replay") {
    val ev = graft.streaming.Sessions.events(spark, sf0001)
      .selectExpr("user_id", "event_type", "ts_ms")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = ev.groupBy(_._1).values.flatMap { g =>
      val views = g.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val v = views.min
        val ps = g.filter(e => e._2 == "purchase" && e._3 >= v).map(_._3)
        if (ps.isEmpty) None else Some((ps.min - v) / 3600000L)
      }
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rows = graft.queries.Insights.conversionLag(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == expect && rows.nonEmpty)
  }

  test("anomaly_days: flagged days equal the driver-side MAD rule") {
    val daily = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000 AS day",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    def medAt(vs: Seq[Long]): Long = vs.sorted.apply(((vs.size + 1) / 2 - 1).toInt)
    val res = daily.map { case (day, c) =>
      val win = daily.filter { case (d2, _) => math.abs(d2 - day) <= 3 }.values
      (day, c, win.sum / win.size)
    }.toSeq.map { case (day, c, t) => (day, c, t, c - t) }
    val med = medAt(res.map(_._4))
    val mad = medAt(res.map(r => math.abs(r._4 - med)))
    val expect = res.filter(r => math.abs(r._4 - med) > 2 * mad)
      .map(r => (r._1, r._2, r._3, r._4)).sortBy(_._1)
    val got = graft.queries.Insights.anomalyDays(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    assert(mad > 0, "the corpus must have residual spread for the rule to mean anything")
  }

  test("dq_checks: every battery row matches an independent recomputation") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
    val nO = o.count(); val nL = li.count()
    val expect = Map(
      "orders.o_custkey not_null" ->
        (nO, o.filter(col("o_custkey").isNull).count()),
      "orders.o_orderkey unique" ->
        (nO, nO - o.select("o_orderkey").distinct().count()),
      "orders.o_orderstatus accepted_values" ->
        (nO, o.filter(!col("o_orderstatus").isin("O", "F", "P")).count()),
      "orders.o_totalprice positive" ->
        (nO, o.filter(col("o_totalprice") <= 0).count()),
      "lineitem.(l_orderkey,l_linenumber) unique" ->
        (nL, nL - li.select("l_orderkey", "l_linenumber").distinct().count()),
      "orders.o_custkey fk customer" ->
        (nO, o.join(cust, o("o_custkey") === cust("c_custkey"), "left_anti").count()),
      "lineitem.l_orderkey fk orders" ->
        (nL, li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti").count()))
    val rows = graft.queries.Insights.dqChecks(spark, sf0001).collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, v) = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2)) == (n, v), r.getString(0))
      assert(r.getBoolean(3) == (v == 0L))
    }
    // the battery must contain at least one real failure on this data
    // (the documented duplicate composite keys) and one pass
    assert(rows.exists(!_.getBoolean(3)) && rows.exists(_.getBoolean(3)))
  }

  test("cumulative_users: first-seen identity equals naive running distinct") {
    val ev = graft.streaming.Sessions.events(spark, sf0001)
      .selectExpr("user_id", "ts_ms div 86400000 AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = ev.map(_._2).distinct.sorted
    val rows = graft.queries.Insights.cumulativeUsers(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == days.toSeq)
    rows.foreach { r =>
      val day = r.getLong(0)
      val active = ev.filter(_._2 == day).map(_._1).distinct.length.toLong
      // the naive definition the one-pass identity must reproduce
      val cum = ev.filter(_._2 <= day).map(_._1).distinct.length.toLong
      val firstSeen = ev.groupBy(_._1).view.mapValues(_.map(_._2).min)
      val nNew = firstSeen.count(_._2 == day).toLong
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == (active, nNew, cum), s"day $day")
    }
  }

  test("dwell_times: per-type aggregates match a driver-side lead recomputation") {
    val ev = graft.streaming.Sessions.events(spark, sf0001)
      .selectExpr("user_id", "event_type", "ts_ms", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val dwells = ev.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._3, e._4))
      s.zip(s.tail).map { case (a, b) => (a._2, b._3 - a._3) }
    }.toSeq
    val rows = graft.queries.Insights.dwellTimes(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = dwells.filter(_._1 == r.getString(0)).map(_._2)
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == g.sum / g.length)
      assert(r.getLong(3) == g.max)
    }
    assert(rows.map(_.getLong(1)).sum == dwells.length.toLong)
  }

  test("entropy_profile: entropies match a driver-side recomputation") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("CAST(o_custkey AS STRING) AS c1",
        "CAST(unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS STRING) AS c2",
        "CAST(o_orderkey AS STRING) AS c3", "o_orderpriority AS c4",
        "o_orderstatus AS c5",
        "CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING) AS c6")
      .collect()
    val cols = Seq("o_custkey", "o_orderdate", "o_orderkey",
      "o_orderpriority", "o_orderstatus", "o_totalprice")
    val rows = graft.queries.Insights.entropyProfile(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == cols)
    cols.zipWithIndex.foreach { case (name, i) =>
      val vals = o.map(_.getString(i))
      val counts = vals.groupBy(identity).values.map(_.size.toLong).toSeq
      val n = vals.length.toDouble
      val h = counts.map { c => -(c / n) * (math.log(c / n) / math.log(2)) }.sum
      val r = rows.find(_.getString(0) == name).get
      assert(r.getLong(1) == vals.length.toLong)
      assert(r.getLong(2) == counts.size.toLong)
      assert(math.abs(r.getDouble(3) - h) < 1e-5, s"$name: ${r.getDouble(3)} vs $h")
    }
    // the key column's entropy is exactly log2(n)
    val key = rows.find(_.getString(0) == "o_orderkey").get
    assert(math.abs(key.getDouble(3) - math.log(key.getLong(1).toDouble) / math.log(2)) < 1e-5)
  }

  test("autocorr_daily: both lags match a driver-side Pearson recomputation") {
    val daily = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000 AS day",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    def pearson(lag: Long): (Long, Double) = {
      val pairs = daily.toSeq.flatMap { case (d, x) =>
        daily.get(d + lag).map(y => (x.toDouble, y.toDouble)) }
      val n = pairs.length.toDouble
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      (pairs.length.toLong,
        (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
    }
    val rows = graft.queries.Insights.autocorrDaily(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 7L))
    rows.foreach { r =>
      val (n, acf) = pearson(r.getLong(0))
      assert(r.getLong(1) == n && n > 100)
      assert(math.abs(r.getDouble(2) - acf) < 1e-5)
    }
  }

  test("calendar_gaps: continuity report matches a driver recompute") {
    val days = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000 AS day")
      .collect().map(_.getLong(0)).distinct.sorted
    val gaps = days.sliding(2).collect { case Array(a, b) => (b - a - 1, a + 1) }.toSeq
    val longest = gaps.map(_._1).max
    val r = graft.queries.Insights.calendarGaps(spark, sf0001).collect().head
    assert(r.getLong(0) == days.length.toLong)
    assert(r.getLong(1) == days.max - days.min + 1 - days.length)
    assert(r.getLong(2) == longest)
    if (longest > 0)
      assert(r.getLong(3) == gaps.filter(_._1 == longest).map(_._2).min)
    // the sparse sf0.001 calendar genuinely has holes
    assert(r.getLong(1) > 0)
  }

  test("sax_symbols: PAA + quartile breakpoints match a driver recompute") {
    // sf0.01: the sf0.001 calendar is too sparse for complete 7-day
    // segments (exactly one qualifies — the zero-variance guard case,
    // covered below); the rich curve needs the denser fixture
    val daily = spark.read.parquet(s"$sf001/orders.parquet")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000 AS day",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val d0 = daily.keys.min
    val segs = daily.toSeq.groupBy { case (d1, _) => (d1 - d0) / 7 }
      .filter(_._2.length == 7)
      .map { case (sg, vs) => (sg, vs.map(_._2).sum / 7) }.toSeq.sortBy(_._1)
    val n = segs.length.toDouble
    val mean = segs.map(s0 => BigInt(s0._2)).sum.toDouble / n
    val sd = math.sqrt(segs.map(s0 => BigInt(s0._2) * s0._2).sum.toDouble / n - mean * mean)
    val expect = segs.map { case (sg, paa) =>
      val z = (paa.toDouble - mean) / sd
      (sg, paa, if (z < -0.6745) "a" else if (z < 0) "b"
        else if (z < 0.6745) "c" else "d")
    }
    val got = graft.queries.Insights.saxSymbols(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == expect)
    // all four letters genuinely occur — the quartile breakpoints bite
    assert(got.map(_._3).distinct.sorted == Seq("a", "b", "c", "d"))
    // the zero-variance guard: sf0.001 has exactly ONE complete segment,
    // which must pin to z=0 ('c') instead of dividing by zero
    val sparse = graft.queries.Insights.saxSymbols(spark, sf0001).collect()
    assert(sparse.length == 1 && sparse.head.getString(2) == "c")
  }

  test("crosscorr_events: per-lag Pearson matches a driver recompute") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("event_type", "unix_millis(CAST(ts AS TIMESTAMP)) div 86400000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def series(t: String) = ev.filter(_._1 == t).groupBy(_._2)
      .map { case (k, v) => k -> v.length.toLong }
    val (x, y) = (series("view"), series("purchase"))
    val expect = (0L to 7L).map { lag =>
      val pts = x.toSeq.flatMap { case (d1, xv) =>
        y.get(d1 + lag).map(yv => (xv.toDouble, yv.toDouble)) }
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      (lag, pts.length.toLong,
        (n * sxy - sx * sy) /
          (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
    }
    val got = graft.queries.Insights.crosscorrEvents(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(g => (g._1, g._2)) == expect.map(e => (e._1, e._2)))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 2e-6, s"lag ${g._1}") }
  }

  test("fano_factor: burstiness over the zero-inclusive hour grid matches a driver recompute") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("event_type", "unix_millis(CAST(ts AS TIMESTAMP)) div 3600000 AS hr")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val nh = ev.map(_._2).max - ev.map(_._2).min + 1
    val expect = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, es) =>
      val counts = es.groupBy(_._2).values.map(_.length.toLong)
      val (sc, scc) = (counts.sum, counts.map(c => c * c).sum)
      val mean = sc.toDouble / nh
      val fano = BigDecimal((scc.toDouble / nh - mean * mean) / mean)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (t, nh, sc, fano)
    }
    val got = graft.queries.Insights.fanoFactor(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expect)
    // Poisson-ish synthetic arrivals: all types near 1, none exactly 1
    got.foreach(t => assert(t._4 > 0.5 && t._4 < 2.0 && t._4 != 1.0))
  }

  test("rfm_segments: quartile codes match a driver recompute and segments span the cube") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_custkey", "unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000 AS day",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mx = orders.map(_._2).max
    val rfm = orders.groupBy(_._1).map { case (ck, os) =>
      (ck, mx - os.map(_._2).max, os.length.toLong, os.map(_._3).sum) }.toSeq
    val nt = rfm.size.toLong
    def codes(key: ((Long, Long, Long, Long)) => (Long, Long)): Map[Long, Long] =
      rfm.sortBy(key).zipWithIndex
        .map { case (r, i) => r._1 -> (4L - i.toLong * 4 / nt) }.toMap
    val qr = codes(r => (r._2, r._1))
    val qf = codes(r => (-r._3, r._1))
    val qm = codes(r => (-r._4, r._1))
    val expect = rfm.groupBy(r => qr(r._1) * 100 + qf(r._1) * 10 + qm(r._1))
      .toSeq.sortBy(_._1).map { case (seg, rs) =>
        val tot = rs.map(_._4).sum
        (seg, rs.length.toLong, tot, tot / rs.length) }
    val got = graft.queries.Insights.rfmSegments(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    // quartile coding is balanced: each R-code holds ~nt/4 customers
    val byR = expect.groupBy(_._1 / 100).map { case (q, xs) => q -> xs.map(_._2).sum }
    byR.values.foreach(v => assert(math.abs(v - nt / 4) <= nt / 4 / 2 + 2))
    // segments genuinely spread over the cube
    assert(expect.size > 10)
  }

  test("holt_forecast: integer Holt recurrences match a driver fold and extrapolate linearly") {
    val days = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000 AS day",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .groupBy("day").agg(org.apache.spark.sql.functions.sum("cents").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2)
    var l = days.head; var b = 0L
    days.tail.foreach { c =>
      val lp = l
      l = (2 * c + 8 * (l + b)) / 10
      b = ((l - lp) + 9 * b) / 10
    }
    val expect = (1L to 7L).map(h => (h, l + h * b)).toSeq
    val got = graft.queries.Insights.holtForecast(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
    // Holt is a LINEAR extrapolation: consecutive horizon steps differ
    // by exactly the final trend b
    val diffs = got.sliding(2).map { case Seq(a2, b2) => b2._2 - a2._2 }.toSeq
    assert(diffs.distinct.size == 1 && diffs.head == b)
  }

  test("haar_transform: pyramid matches a driver lifting and conserves mass/energy structure") {
    val daily = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000 AS day",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .groupBy("day").agg(org.apache.spark.sql.functions.sum("cents").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val d0 = daily.map(_._1).min
    val series = Array.fill(32)(0L)
    daily.foreach { case (day, c) =>
      val i = (day - d0).toInt; if (i >= 0 && i < 32) series(i) = c }
    var a = series
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    for (l <- 1 to 5) {
      val det = Array.tabulate(a.length / 2)(i => a(2 * i) - a(2 * i + 1))
      a = Array.tabulate(a.length / 2)(i => a(2 * i) + a(2 * i + 1))
      det.zipWithIndex.foreach { case (c, i) => expect += ((l, i, c)) }
    }
    expect += ((6, 0, a(0)))
    val got = graft.queries.Insights.haarTransform(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == expect.toSeq)
    // the final approx is the exact 32-day mass (lossless lifting)
    assert(got.last._3 == series.sum)
    assert(got.size == 32)
  }

  test("decayed_revenue: half-life weighting matches a driver recompute and favors recency") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        "unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000 AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nk = spark.read.parquet(s"$sf0001/customer.parquet")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val nn = spark.read.parquet(s"$sf0001/nation.parquet")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0).toLong -> r.getString(1)).toMap
    val mx = orders.map(_._3).max
    val expect = orders.groupBy(o => nn(nk(o._1))).map { case (nation, os) =>
      val raw = os.map(_._2).sum
      val dec = os.map { case (_, c, day) =>
        val sh = (mx - day) / 30
        if (sh > 62) BigInt(0) else BigInt(c) * (1000000000L >> sh.toInt)
      }.sum / 1000000000
      (nation, raw, dec.toLong)
    }.toSeq.sortBy(_._1)
    val got = graft.queries.Insights.decayedRevenue(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    // decay bites: every nation's decayed total is strictly below raw
    got.foreach { case (n, raw, dec) =>
      assert(dec < raw, s"$n: decay must discount history") }
  }

  test("bootstrap_ci: Poisson replicate means match a driver recompute and bracket the point") {
    val cents = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_orderkey", "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val thr = Seq(367879443L, 735758887L, 919698609L, 981011849L,
      996340160L, 999405822L)
    def w(k: Long, b: Long): Long = {
      val u = ((k * 32 + b) % 2147483647L) * 2654435761L % 1000000007L
      thr.indexWhere(u < _) match { case -1 => 6L; case i => i.toLong }
    }
    val ms = (0L until 32L).map { b =>
      val (swc, sw) = cents.foldLeft((BigInt(0), 0L)) {
        case ((a, n), (k, c)) =>
          val wi = w(k, b); (a + BigInt(wi * c), n + wi)
      }
      (swc * 10000 / sw).toLong
    }.sorted
    val point = cents.map(c => BigInt(c._2)).sum * 10000 / cents.length
    val r = graft.queries.Insights.bootstrapCi(spark, sf0001).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((32L, point.toLong, ms(1), ms(30))))
    // a CI worthy of the name: brackets the point estimate with width > 0
    assert(r.getLong(2) <= r.getLong(1) && r.getLong(1) <= r.getLong(3))
    assert(r.getLong(3) > r.getLong(2))
  }

  test("anova_f: between/within decomposition matches a driver recompute") {
    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_orderpriority", "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, vs) => (vs.length.toLong, vs.map(v => BigInt(v._2)).sum,
        vs.map(v => BigInt(v._2) * v._2).sum) }
    val (k, nt) = (groups.length.toDouble, rows.length.toDouble)
    val st = groups.map(_._2).sum.toDouble
    // same left-to-right fold order as both engines' sorted-array fold
    val sgs = groups.foldLeft(0.0) { case (acc, (n, s0, _)) =>
      acc + s0.toDouble * s0.toDouble / n }
    val sst = groups.foldLeft(0.0) { case (acc, (_, _, ss)) => acc + ss.toDouble }
    val corr = st * st / nt
    val f = BigDecimal(((sgs - corr) / (k - 1)) / ((sst - sgs) / (nt - k)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = graft.queries.Insights.anovaF(spark, sf0001).collect().head
    assert(r.getLong(0) == groups.length.toLong)
    assert(r.getLong(1) == rows.length.toLong)
    assert(r.getDouble(2) == f)
  }

  test("ts_motif: closest non-overlapping 7-day windows match a driver scan") {
    val daily = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000 AS day",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d0, v) => d0 -> v.map(_._2).sum / 1000 }
    val windows = daily.keys.toSeq.sorted.flatMap { d0 =>
      val w = (d0 to d0 + 6).flatMap(daily.get)
      if (w.length == 7) Some(d0 -> w.toArray) else None
    }
    val best = (for {
      (d1, v1) <- windows; (d2, v2) <- windows if d2 >= d1 + 7
    } yield (v1.zip(v2).map { case (a, b) => (a - b) * (a - b) }.sum, d1, d2))
      .minBy(identity)
    val r = graft.queries.Insights.tsMotif(spark, sf0001).collect().head
    assert((r.getLong(2), r.getLong(0), r.getLong(1)) == best)
  }

  test("cusum_changepoint: peak |cusum| day matches a driver-side scan") {
    val daily = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000 AS day",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }.toSeq.sortBy(_._1)
    val mu = daily.map(_._2).sum / daily.length
    var run = 0L
    val cusum = daily.map { case (day, c) => run += c - mu; (day, math.abs(run)) }
    val (expectDay, expectS) = cusum.maxBy { case (day, s0) => (s0, -day) }
    val r = graft.queries.Insights.cusumChangepoint(spark, sf0001).collect().head
    assert(r.getLong(0) == daily.length.toLong)
    assert(r.getLong(1) == expectDay && r.getLong(2) == expectS)
  }

  test("gini_spend: concentration matches a driver-side Lorenz recomputation") {
    val spend = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }.toSeq
    val ranked = spend.sortBy { case (ck, c) => (c, ck) }.map(_._2).zipWithIndex
    val n = ranked.length.toDouble
    val sx = ranked.map(p => BigInt(p._1)).sum.toDouble
    val six = ranked.map { case (x, i) => BigInt(i + 1) * x }.sum.toDouble
    val gini = (2.0 * six - (n + 1) * sx) / (n * sx)
    val r = graft.queries.Insights.giniSpend(spark, sf0001).collect().head
    assert(r.getLong(0) == ranked.length.toLong)
    assert(r.getLong(1) == Math.round(gini * 1e6))
    assert(r.getLong(1) > 0L && r.getLong(1) < 1000000L)
  }

  test("theil_sen: median pairwise slope matches a driver-side recomputation") {
    val daily = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000 AS day",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }.toSeq.sortBy(_._1)
    val slopes = (for {
      (d1, c1) <- daily; (d2, c2) <- daily if d1 < d2
    } yield ((c2 - c1).toDouble / (d2 - d1).toDouble, d1, d2))
      .sortBy { case (s0, d1, d2) => (s0, d1, d2) }
    val median = slopes((slopes.length + 1) / 2 - 1)._1
    val r = graft.queries.Insights.theilSen(spark, sf0001).collect().head
    assert(r.getLong(0) == daily.length.toLong)
    assert(r.getLong(1) == slopes.length.toLong)
    assert(r.getLong(2) == Math.round(median * 1e6))
    // robustness sanity: the estimate is a real interior slope, and the
    // day dimension genuinely exercises the pair stage
    assert(daily.length > 100 && slopes.length > 5000)
  }
}
