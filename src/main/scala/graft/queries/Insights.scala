package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Commerce/product-analytics insight queries — the reporting layer a
  * data team runs ON TOP of the relational core: market-basket
  * association rules, time-bucket OHLC downsampling, and A/B contingency
  * testing. All outputs are exact integers (cents / basis points) except
  * the chi-square statistic, which follows the repo convention of ONE
  * fixed double expression tree rounded to a declared precision
  * (psi_drift's pattern).
  */
object Insights {

  /** Orders with more distinct parts than this are dropped from pair
    * generation — same declared hub cap as the co-purchase graph
    * ([[Graph]].BasketCap): a k-part basket emits k(k−1)/2 pairs, and a
    * pathological mega-basket must not quadratically dominate the
    * explode. No-op at TPC-H shape (≤7 lines/order); mirrored in the
    * oracle.
    */
  private val BasketCap = 64

  /** Market-basket association rules over (order, part) baskets — the
    * classic retail co-occurrence report: for each part pair appearing
    * together in ≥2 orders, exact support / confidence (both directions)
    * / lift in integer basis points (lift in ppm). Pair counts come from
    * the dedup-family basket machinery (group the fact table by order,
    * explode ordered pairs from the sorted in-row part list —
    * [[graft.operators.Dedup.pairsOf]]) so there is NO fact-table
    * self-join; per-item supports are one hash aggregate joined onto the
    * (much smaller) qualifying-pair table, and the basket total is a
    * broadcast scalar. Top-100 by (n_uv, u, v) plans as
    * TakeOrderedAndProject — the driver never sees an unbounded result.
    */
  def assocRules(s: SparkSession, d: String): DataFrame = {
    val lp = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val pairs = lp.groupBy(col("ok"))
      .agg(sort_array(collect_list(col("pk"))).as("pks"))
      .filter(size(col("pks")) > 1 && size(col("pks")) <= BasketCap)
      .select(explode(graft.operators.Dedup.pairsOf(col("pks"), Int.MaxValue)).as("p"))
      .select(col("p.id1").as("u"), col("p.id2").as("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("n_uv"))
      .filter(col("n_uv") >= 2)
    val item = lp.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    val n = broadcast(lp.agg(countDistinct(col("ok")).as("N")))
    pairs
      .join(item.select(col("pk").as("u"), col("n_item").as("n_u")), "u")
      .join(item.select(col("pk").as("v"), col("n_item").as("n_v")), "v")
      .crossJoin(n)
      .selectExpr("u", "v", "n_uv", "n_u", "n_v",
        "n_uv * 10000 div N AS support_bp",
        "n_uv * 10000 div n_u AS conf_uv_bp",
        "n_uv * 10000 div n_v AS conf_vu_bp",
        "n_uv * N * 1000000 div (n_u * n_v) AS lift_ppm")
      .orderBy(col("n_uv").desc, col("u"), col("v"))
      .limit(100)
  }

  /** Hourly OHLC bars per event type — the time-series downsampling
    * resample every metrics store performs before charting: open/close
    * are the cents value of the (ts, event_id)-first/last event in the
    * bucket via min/max over a (ts_ms, event_id, cents) struct (struct
    * ordering is lexicographic in BOTH engines, and (ts_ms, event_id)
    * is unique, so ties cannot reach the value field), high/low/volume
    * are plain aggregates. ONE hash aggregate with map-side partials —
    * no window, no second pass; at 100 TB the bucket count is
    * hours×types, constant in data size.
    */
  def ohlcBars(s: SparkSession, d: String): DataFrame = {
    val k = struct(col("ts_ms"), col("event_id"), col("cents"))
    graft.streaming.Sessions.events(s, d)
      .select(col("event_type").as("etype"), col("ts_ms"),
        col("event_id"), round(col("value") * 100).cast("long").as("cents"))
      .withColumn("bar_ms", expr("ts_ms div 3600000 * 3600000"))
      .groupBy(col("etype"), col("bar_ms"))
      .agg(min(k).as("o"), max(k).as("c"),
        max(col("cents")).as("high_c"), min(col("cents")).as("low_c"),
        count(lit(1)).as("n_events"), sum(col("cents")).as("vol_c"))
      .select(col("etype"), col("bar_ms"), col("o.cents").as("open_c"),
        col("high_c"), col("low_c"), col("c.cents").as("close_c"),
        col("n_events"), col("vol_c"))
      .orderBy(col("etype"), col("bar_ms"))
  }

  /** A/B contingency test — variant assignment by user-id parity (the
    * deterministic stand-in for a bucketing hash), success = the event
    * is a purchase; one conditional aggregate produces the full 2×2
    * table in a single pass (no groupBy+pivot), conversion rates in
    * exact basis points, and the 1-dof chi-square statistic as one
    * double expression tree rounded to 6 dp (the integer cross-products
    * overflow int64 beyond ~sf1, so the statistic is double by design —
    * same convention as psi_drift). Output is a single row.
    */
  def abChisq(s: SparkSession, d: String): DataFrame = {
    val a = col("user_id") % 2 === 0
    val p = col("event_type") === "purchase"
    graft.streaming.Sessions.events(s, d).agg(
        sum(when(a, 1L).otherwise(0L)).as("n_a"),
        sum(when(a && p, 1L).otherwise(0L)).as("x_a"),
        sum(when(!a, 1L).otherwise(0L)).as("n_b"),
        sum(when(!a && p, 1L).otherwise(0L)).as("x_b"))
      .selectExpr("n_a", "x_a", "n_b", "x_b",
        "x_a * 10000 div n_a AS conv_a_bp",
        "x_b * 10000 div n_b AS conv_b_bp",
        """round(CAST(n_a + n_b AS DOUBLE)
          |  * pow(CAST(x_a AS DOUBLE) * CAST(n_b - x_b AS DOUBLE)
          |        - CAST(x_b AS DOUBLE) * CAST(n_a - x_a AS DOUBLE), 2)
          |  / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
          |     * CAST(x_a + x_b AS DOUBLE)
          |     * CAST(n_a + n_b - x_a - x_b AS DOUBLE)), 6) AS chi2_6dp"""
          .stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "assoc_rules" -> assocRules,
    "ohlc_bars" -> ohlcBars,
    "ab_chisq" -> abChisq,
  )

  val oracleSql: Map[String, String] = Map(
    "assoc_rules" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |bk AS (SELECT ok FROM lp GROUP BY ok
        |       HAVING count(*) > 1 AND count(*) <= 64),
        |pr AS (SELECT a.pk AS u, b.pk AS v, count(*)::BIGINT AS n_uv
        |       FROM lp a JOIN bk USING (ok) JOIN lp b USING (ok)
        |       WHERE a.pk < b.pk GROUP BY 1, 2 HAVING count(*) >= 2),
        |it AS (SELECT pk, count(*)::BIGINT AS n_item FROM lp GROUP BY 1),
        |nn AS (SELECT count(DISTINCT ok)::BIGINT AS N FROM lp)
        |SELECT u, v, n_uv, iu.n_item AS n_u, iv.n_item AS n_v,
        |  (n_uv * 10000) // N AS support_bp,
        |  (n_uv * 10000) // iu.n_item AS conf_uv_bp,
        |  (n_uv * 10000) // iv.n_item AS conf_vu_bp,
        |  (n_uv * N * 1000000) // (iu.n_item * iv.n_item) AS lift_ppm
        |FROM pr JOIN it iu ON pr.u = iu.pk JOIN it iv ON pr.v = iv.pk, nn
        |ORDER BY n_uv DESC, u, v LIMIT 100""".stripMargin,
    "ohlc_bars" ->
      """WITH ev AS (SELECT event_type AS etype, epoch_ms(ts) AS ts_ms,
        |    event_id, CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |SELECT etype, (ts_ms // 3600000) * 3600000 AS bar_ms,
        |  (min(struct_pack(a := ts_ms, b := event_id, c := cents))).c AS open_c,
        |  max(cents) AS high_c, min(cents) AS low_c,
        |  (max(struct_pack(a := ts_ms, b := event_id, c := cents))).c AS close_c,
        |  count(*)::BIGINT AS n_events, sum(cents)::BIGINT AS vol_c
        |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ab_chisq" ->
      """WITH c AS (SELECT
        |    count(*) FILTER (WHERE user_id % 2 = 0)::BIGINT AS n_a,
        |    count(*) FILTER (WHERE user_id % 2 = 0
        |      AND event_type = 'purchase')::BIGINT AS x_a,
        |    count(*) FILTER (WHERE user_id % 2 = 1)::BIGINT AS n_b,
        |    count(*) FILTER (WHERE user_id % 2 = 1
        |      AND event_type = 'purchase')::BIGINT AS x_b
        |  FROM events)
        |SELECT n_a, x_a, n_b, x_b,
        |  (x_a * 10000) // n_a AS conv_a_bp,
        |  (x_b * 10000) // n_b AS conv_b_bp,
        |  round(CAST(n_a + n_b AS DOUBLE)
        |    * pow(CAST(x_a AS DOUBLE) * CAST(n_b - x_b AS DOUBLE)
        |          - CAST(x_b AS DOUBLE) * CAST(n_a - x_a AS DOUBLE), 2)
        |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
        |       * CAST(x_a + x_b AS DOUBLE)
        |       * CAST(n_a + n_b - x_a - x_b AS DOUBLE)), 6) AS chi2_6dp
        |FROM c""".stripMargin,
  )
}
