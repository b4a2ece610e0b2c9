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
}
