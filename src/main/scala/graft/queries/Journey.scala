package graft.queries

import graft.operators.AsOfJoin
import graft.sources.Tables
import graft.streaming.Sessions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / event-stream analytics the reference's MapReduce shape
  * generalizes to (reference analogue: the grouped-reduce phase,
  * `mapreduce.c:105-213` — these are grouped reductions with ordering
  * semantics layered on top), plus the CDC upsert a batch pipeline runs
  * to fold late-arriving changes into a base table.
  *
  * Oracle-parity conventions as everywhere: exact integer epoch-ms
  * (ns `div` — never double math), BIGINT counts, integer cents, total
  * ORDER BY on every result.
  */
object Journey {

  private def ev(s: SparkSession, d: String): DataFrame =
    Sessions.events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"), col("ts_ms"))

  // --- funnel -----------------------------------------------------------

  /** Ordered funnel conversion: view -> click -> purchase, each stage's
    * FIRST event at-or-after the user's previous-stage entry time. The
    * classic product-analytics query; three per-user min-aggregates
    * chained by co-partitioned joins on user_id (every shuffle is on the
    * same key, so at scale the exchanges reuse one partitioning — no
    * all-pairs work, no window over the full stream).
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("view_ms"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts_ms") >= col("view_ms"))
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("click_ms"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts_ms") >= col("click_ms"))
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("purchase_ms"))
    e.agg(countDistinct(col("user_id")).as("n_users"))
      .crossJoin(v.agg(count(lit(1)).as("n_view")))
      .crossJoin(c.agg(count(lit(1)).as("n_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
  }

  // --- sliding-window distinct count ------------------------------------

  /** Distinct users in the trailing hour at every event — an operator
    * Spark's window functions genuinely lack (no DISTINCT aggregates
    * over frames).
    *
    * This is the SHARDED formulation that actually scales: a naive
    * global-ORDER-BY window would serialize the whole timeline through
    * one partition. Instead each event owns the 2-hour time shard
    * `ts div 2h`, events in the last hour of a shard are ALSO copied
    * into the next shard as lookback context (owned=false), the shards
    * are processed independently, and only owner rows survive. Every
    * row's 1-hour frame is fully present in its shard, so the result is
    * exactly the global-window answer — the oracle is DuckDB's true
    * global `count(DISTINCT) OVER (RANGE ...)`, which pins the
    * equivalence — while Spark's parallelism is (timeline / 2h) with
    * ≤50% row duplication.
    *
    * Inside a shard the count is a TWO-POINTER SLIDING MULTISET in one
    * `mapPartitions` pass over shard-sorted events (a legitimate
    * per-partition-imperative use: built-ins would materialize the full
    * frame per row — `collect_list` over a hot hour is O(frame) list
    * build per OUTPUT row and an O(frame²)-bytes window buffer, the
    * round-4 scale-killer). Here state is ONE live window: events enter
    * at the frame head grouped by equal ts (RANGE-frame peer semantics),
    * leave when older than 1 h, and a user→count map gives the distinct
    * count in O(1) per event. Memory = one hour of events per shard,
    * not one hour SQUARED.
    */
  def windowDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ShardMs = 7200000L // 2 h shards, 1 h lookback overlap
    val FrameMs = 3600000L
    val e = ev(s, d).select(col("event_id"), col("user_id"), col("ts_ms"))
    val owners = e.withColumn("shard", expr(s"ts_ms div $ShardMs"))
      .withColumn("owned", lit(true))
    val context = e.filter(pmod(col("ts_ms"), lit(ShardMs)) >= ShardMs - FrameMs)
      .withColumn("shard", expr(s"ts_ms div $ShardMs") + 1L)
      .withColumn("owned", lit(false))
    owners.unionByName(context)
      .select(col("shard"), col("ts_ms"), col("event_id"), col("user_id"),
        col("owned"))
      .as[(Long, Long, Long, Long, Boolean)]
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("ts_ms"))
      .mapPartitions { it =>
        val buf = it.buffered
        var curShard = Long.MinValue
        // the one live frame: FIFO of (ts, user) + user multiset
        val window = new java.util.ArrayDeque[(Long, Long)]()
        val counts = new java.util.HashMap[Long, Int]()
        val group = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
        new Iterator[(Long, Long)] {
          val pending = scala.collection.mutable.Queue.empty[(Long, Long)]
          // drain ts-groups until one yields an owner row (a trailing
          // group may be all lookback context and emit nothing)
          private def fill(): Unit = {
            while (pending.isEmpty && buf.hasNext) {
              val (shard, ts, _, _, _) = buf.head
              if (shard != curShard) { // shard boundary: fresh frame
                curShard = shard; window.clear(); counts.clear()
              }
              // admit ALL events at this ts (RANGE peers count each other)
              group.clear()
              while (buf.hasNext && buf.head._1 == curShard && buf.head._2 == ts) {
                val (_, _, id, user, owned) = buf.next()
                window.addLast((ts, user))
                counts.merge(user, 1, Integer.sum)
                group += ((id, owned))
              }
              // retire events older than the 1 h frame
              while (!window.isEmpty && window.peekFirst()._1 < ts - FrameMs) {
                val (_, u) = window.pollFirst()
                if (counts.merge(u, -1, Integer.sum) == 0) counts.remove(u)
              }
              val du = counts.size.toLong
              group.foreach { case (id, owned) =>
                if (owned) pending.enqueue((id, du))
              }
            }
          }
          def hasNext: Boolean = { fill(); pending.nonEmpty }
          def next(): (Long, Long) = { fill(); pending.dequeue() }
        }
      }
      .toDF("event_id", "du")
      .orderBy(col("event_id"))
  }

  // --- nearest-in-time as-of join ---------------------------------------

  /** Nearest signup to every error event, in EITHER time direction (ties
    * break backward) — the bidirectional completion of asof_join /
    * asof_forward. Runs [[AsOfJoin.lastValue]] and [[AsOfJoin.nextValue]]
    * back-to-back (two shuffle-sorts on user_id, no join operator, no
    * nested loop) and picks the closer candidate per row. The build side
    * is deduped to one row per (user, ts) first so both engines' at-equal
    * -ts choice is unambiguous.
    */
  def asofNearest(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val su = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts_ms")).agg(min(col("event_id")).as("b_id"))
    val back = su.select(col("user_id"), col("ts_ms"),
      struct(col("ts_ms").as("ts"), col("b_id").as("id")).as("back"))
    val fwd = su.select(col("user_id"), col("ts_ms"),
      struct(col("ts_ms").as("ts"), col("b_id").as("id")).as("fwd"))
    val probe = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts_ms"))
    val joined = AsOfJoin.nextValue(
      AsOfJoin.lastValue(probe, back, "user_id", "ts_ms", "back"),
      fwd, "user_id", "ts_ms", "fwd")
    val nearest: Column =
      when(col("back").isNull, col("fwd"))
        .when(col("fwd").isNull, col("back"))
        .when(col("ts_ms") - col("back.ts") <= col("fwd.ts") - col("ts_ms"),
          col("back"))
        .otherwise(col("fwd"))
    joined
      .withColumn("near", nearest)
      .select(col("user_id"), col("event_id"), col("ts_ms"),
        col("near.id").as("signup_id"),
        abs(col("near.ts") - col("ts_ms")).as("delta_ms"))
      .orderBy(col("user_id"), col("event_id"))
  }

  // --- CDC merge / upsert -----------------------------------------------

  /** Batch CDC upsert: fold a change batch (updates + inserts, derived
    * deterministically from orders itself: every 7th key re-priced and
    * re-statused, every 997th key cloned as a brand-new order) into the
    * base table with MERGE semantics — update wins over base, inserts
    * append. One full-outer join on the key (co-partitioned, no driver
    * data), then an audit aggregate per action+status with exact cents.
    * This is the plan shape a lakehouse MERGE INTO executes; without a
    * transactional table format the join IS the merge.
    */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      col("o_orderstatus").as("b_status"),
      round(col("o_totalprice") * 100).cast("long").as("b_cents"))
    val upd = base.filter(pmod(col("k"), lit(7L)) === 0L)
      .select(col("k"), lit("U").as("c_status"), (col("b_cents") + 100L).as("c_cents"))
    // synthetic insert keys are NEGATED (orderkeys are positive at every
    // sf), so they can never collide with a real key — a fixed additive
    // offset would alias once max(o_orderkey) outgrows it
    val ins = base.filter(pmod(col("k"), lit(997L)) === 0L)
      .select((-col("k") - 1L).as("k"), lit("N").as("c_status"),
        lit(9999L).as("c_cents"))
    val changes = upd.unionByName(ins)
    base.join(changes, Seq("k"), "full_outer")
      .select(
        when(col("b_status").isNull, lit("insert"))
          .when(col("c_status").isNull, lit("keep"))
          .otherwise(lit("update")).as("action"),
        coalesce(col("c_status"), col("b_status")).as("status"),
        coalesce(col("c_cents"), col("b_cents")).as("cents"))
      .groupBy(col("action"), col("status"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("action"), col("status"))
  }

  // --- SCD type-2 history build ----------------------------------------

  /** Slowly-changing-dimension (type 2) history: collapse each
    * customer's order-status timeline into validity intervals — one row
    * per consecutive status run with [from, to) epoch-day bounds (open
    * current version = null to). The run detection is the gaps-and-
    * islands idiom (lag + running sum over ONE per-customer window
    * order), so the whole build is a single shuffle on the dimension
    * key; this is how a warehouse derives SCD2 from an append-only
    * change log without a transactional store.
    */
  def scd2Build(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_custkey").as("cust"), col("o_orderkey").as("ok"),
      datediff(col("o_orderdate").cast("date"), to_date(lit("1970-01-01")))
        .cast("long").as("day"),
      col("o_orderstatus").as("st"))
    val w = Window.partitionBy(col("cust")).orderBy(col("day"), col("ok"))
    val runs = o
      .withColumn("chg",
        when(lag(col("st"), 1).over(w).isNull ||
          lag(col("st"), 1).over(w) =!= col("st"), 1L).otherwise(0L))
      .withColumn("ver", sum(col("chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val versions = runs.groupBy(col("cust"), col("ver"), col("st"))
      .agg(min(col("day")).as("from_day"), count(lit(1)).as("n_orders"))
    val wv = Window.partitionBy(col("cust")).orderBy(col("ver"))
    versions
      .withColumn("to_day", lead(col("from_day"), 1).over(wv))
      .select(col("cust"), col("ver"), col("st"), col("from_day"),
        col("to_day"), col("n_orders"))
      .orderBy(col("cust"), col("ver"))
  }

  /** Temporal (as-of) lookup against the SCD2 dimension [[scd2Build]]
    * derives — the standard warehouse pattern: each lineitem joins the
    * ordering customer's status version VALID AT its ship day, and the
    * result is the (order status × as-of status) drift matrix. The
    * join is an EQUI-join on the dimension key with the interval
    * predicate as residual — per-key version counts are small (bounded
    * by status changes), so this is dimension-lookup-shaped at any
    * fact scale; never an interval cross join. A LEFT join keeps
    * before-history facts (this data ships ~half its lines before the
    * order date — independent synthetic draws) as an explicit 'none'
    * class, so the output reconciles to the fact row count exactly.
    */
  def scd2Lookup(s: SparkSession, d: String): DataFrame = {
    val dim = scd2Build(s, d)
      .select(col("cust").as("vc"), col("st").as("vst"),
        col("from_day"), col("to_day"))
    val facts = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
        datediff(col("l_shipdate").cast("date"), to_date(lit("1970-01-01")))
          .cast("long").as("ship_day"))
      .join(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")),
        col("l_orderkey") === col("o_orderkey"))
    facts.join(dim,
        col("o_custkey") === col("vc") &&
          col("ship_day") >= col("from_day") &&
          (col("to_day").isNull || col("ship_day") < col("to_day")),
        "left_outer")
      .select(col("o_orderstatus"), coalesce(col("vst"), lit("none")).as("asof_st"))
      .groupBy(col("o_orderstatus"), col("asof_st"))
      .agg(count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderstatus"), col("asof_st"))
  }

  // --- event transition matrix ------------------------------------------

  /** First-order Markov transition counts/probabilities between event
    * types per user timeline (what follows what): lead() over the
    * per-user total order, then one count aggregate; probability is the
    * fixed expression round(n/total, 6) on both engines. Sequence-mining
    * primitive for behavioral modeling; one window shuffle + one agg.
    */
  /** First- and last-touch purchase attribution — which event type gets
    * credit for each purchase (the marketing-analytics staple): one
    * KEYED window pass per user computes both the first and the most
    * recent non-purchase event type strictly before each event
    * (first/last with ignoreNulls over the preceding-rows frame — both
    * models from the SAME frame, one WindowExec), then purchases are
    * counted per (model, touch). Partition-parallel at any scale; a
    * purchase with no preceding touch credits 'none' rather than being
    * dropped (the honest direct-traffic row).
    */
  def attribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    ev(s, d)
      // both window expressions in ONE projection: chained withColumns
      // interleave a Project computing the shared CASE input, which
      // blocks CollapseWindow and plans two Window passes
      .select(col("event_type"),
        first(touch, ignoreNulls = true).over(w).as("ft"),
        last(touch, ignoreNulls = true).over(w).as("lt"))
      .filter(col("event_type") === "purchase")
      // both models fan out map-side from the one windowed pass — a
      // union of two aggregates re-plans the window per branch
      .select(explode(array(
        struct(lit("first_touch").as("model"),
          coalesce(col("ft"), lit("none")).as("touch")),
        struct(lit("last_touch").as("model"),
          coalesce(col("lt"), lit("none")).as("touch")))).as("mt"))
      .groupBy(col("mt.model").as("model"), col("mt.touch").as("touch"))
      .agg(count(lit(1)).as("n_purchases"))
      .orderBy(col("model"), col("touch"))
  }

  def transitionMatrix(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val steps = ev(s, d)
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("event_type").as("cur"), col("nxt"))
    val counts = steps.groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("cur")).agg(sum(col("n")).as("total"))
    counts.join(totals, "cur")
      .select(col("cur"), col("nxt"), col("n"),
        round(col("n").cast("double") / col("total"), 6).as("p"))
      .orderBy(col("cur"), col("nxt"))
  }

  /** Per-state transition entropy — the predictability number on top
    * of [[transitionMatrix]] (the matrix says WHERE users go next;
    * H(next|cur) says how predictable that is: H ≈ 0 means a
    * deterministic funnel step worth prefetching/caching, H near
    * ln(k) means anything can happen). Same lead-window transition
    * definition as the matrix (single-sourced semantics); per-(cur,
    * next) terms −(c/n)·ln(c/n) are rounded ONCE to nano-nats from
    * exact integer counts (the effective_sources discipline), summed
    * exactly per state, with the effective branching factor e^H
    * published in milli. One window + two dimension-sized aggregates.
    */
  def transitionEntropy(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val steps = ev(s, d)
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("event_type").as("cur"), col("nxt"))
    val counts = steps.groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("cur")).agg(sum(col("c")).as("n"))
    counts.join(totals, "cur")
      .select(col("cur"), col("n"),
        expr("CAST(round(-1e9 * (CAST(c AS DOUBLE) / n)" +
          " * ln(CAST(c AS DOUBLE) / n)) AS BIGINT)").as("term"))
      .groupBy(col("cur"), col("n"))
      .agg(sum(col("term")).as("h_nano"))
      .select(col("cur"), col("n").as("n_trans"), col("h_nano"),
        expr("CAST(round(1000 * exp(CAST(h_nano AS DOUBLE) / 1e9)) AS BIGINT)")
          .as("eff_branching_milli"))
      .orderBy(col("cur"))
  }

  // --- session path mining ----------------------------------------------

  /** Top-20 most common within-session event-type sequences (the
    * sequence-mining step behind "what do users actually do"): 30-minute
    * gap sessions via gaps-and-islands, each session's path built by
    * sorting the collected (ts, id, type) structs IN-ROW (array_sort on
    * a grouped collect_list — no per-group window sort), then one count
    * aggregate over paths. Three shuffles total (user window, session
    * agg, path count); path cardinality, not event volume, bounds the
    * final stage. Long sessions bound the in-row array by the session
    * span — the same contract as the session aggregates themselves.
    */
  def eventPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val gapped = ev(s, d)
      .withColumn("prev", lag(col("ts_ms"), 1).over(w))
      .withColumn("gap",
        when(col("prev").isNull || col("ts_ms") - col("prev") > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("sess",
        sum(col("gap")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val paths = gapped.groupBy(col("user_id"), col("sess"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ts_ms"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type")),
        ">").as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  // --- last-observation-carried-forward ---------------------------------

  /** LOCF gap fill: every event carries its user's most recent purchase
    * amount (NULL before the first purchase) — the standard time-series
    * imputation / "state at event time" join. One window shuffle on
    * user_id with `last(..., ignoreNulls)` over the running frame; frame
    * state is a single value, so scale is bounded by the user-partition
    * sort alone. The oracle pins Spark's ignoreNulls against DuckDB's
    * IGNORE NULLS.
    */
  def locfFill(s: SparkSession, d: String): DataFrame = {
    val e = Sessions.events(s, d).select(col("event_id"), col("user_id"),
      col("ts_ms"), col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    e.withColumn("last_purchase_cents",
        last(when(col("event_type") === "purchase", col("cents")),
          ignoreNulls = true).over(w))
      .select(col("event_id"), col("last_purchase_cents"))
      .orderBy(col("event_id"))
  }

  // --- EWMA (stateful scan) ----------------------------------------------

  /** Exponentially-weighted moving average of each user's event values —
    * the per-key RECURRENCE (s_t depends on s_{t−1}'s OUTPUT) that no
    * window frame expresses and that runs on
    * [[graft.operators.StatefulScan]]: one hash shuffle on user_id, an
    * in-partition sort, one streaming pass with O(1) state. α = 1/2 in
    * EXACT INTEGER cents — `s_t = (x_t + s_{t−1}) div 2`, seeded
    * s_0 = x_0 — so a million-event history accumulates zero float
    * drift and the DuckDB oracle (a linear recursive CTE over the
    * per-user row_number chain) matches bit-for-bit. The power-series
    * "EWMA as a window sum" trick is deliberately NOT used: its
    * 1/(1−α)^i terms overflow double past ~1000 rows per key — a
    * small-SF-only plan.
    */
  def ewmaFeatures(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val ev = Sessions.events(s, d).select(
      col("event_id"), col("user_id"), col("ts_ms"),
      round(col("value") * 100).cast("long").as("cents"))
    val schema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("user_id", LongType, nullable = false),
      StructField("cents", LongType, nullable = false),
      StructField("ewma_cents", LongType, nullable = false)))
    graft.operators.StatefulScan.perKey[Long](
      ev, "user_id", Seq(col("ts_ms"), col("event_id")), schema) { (st, r) =>
      val cents = r.getLong(3)
      val e = st match {
        case None => cents
        // JVM `/` matches the oracle's `//` for ALL inputs, negatives
        // included: DuckDB's integer `//` TRUNCATES toward zero just
        // like JVM integer division (measured: SELECT (-5)//2 = -2; the
        // floor behavior applies only to FLOAT operands). floorDiv here
        // would silently diverge on negative cents.
        case Some(prev) => (cents + prev) / 2
      }
      (e, org.apache.spark.sql.Row(r.getLong(0), r.getLong(1), cents, e))
    }.orderBy(col("event_id"))
  }

  // --- snapshot diff -----------------------------------------------------

  /** Two-snapshot diff by key — the read-side companion to
    * [[mergeUpsert]] and the row-level drill-down behind
    * `table_checksum`'s one-number verdict: after a copy/migrate/
    * backfill, WHICH keys were added, removed, or changed. The two
    * snapshots are deterministic slices of orders (old drops keys
    * ≡0 mod 10, new drops ≡0 mod 7 and bumps cents on ≡0 mod 5), so
    * every status class is populated and the oracle states the exact
    * row set. One full-outer hash join on the key — at 100 TB both
    * snapshots are bucketed on the key ([[graft.sources.Layout]]), so
    * the join plans with zero Exchange; unchanged rows are filtered
    * before the output sort.
    */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val old = base.filter(pmod(col("k"), lit(10L)) =!= 0L)
      .select(col("k"), col("cents").as("old_cents"))
    val neu = base.filter(pmod(col("k"), lit(7L)) =!= 0L)
      .select(col("k"),
        when(pmod(col("k"), lit(5L)) === 0L, col("cents") + 1L)
          .otherwise(col("cents")).as("new_cents"))
    old.join(neu, Seq("k"), "full_outer")
      .select(col("k"),
        when(col("old_cents").isNull, lit("added"))
          .when(col("new_cents").isNull, lit("removed"))
          .when(col("old_cents") =!= col("new_cents"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("old_cents"), col("new_cents"))
      .filter(col("status") =!= "unchanged")
      .orderBy(col("k"))
  }

  // --- maintenance identities -------------------------------------------

  /** Incremental view maintenance of a grouped aggregate: the base
    * period's aggregate and the delta period's aggregate are MERGED
    * (full outer on the group key, counters summed) instead of
    * re-aggregating raw history — the identity every incremental
    * pipeline relies on to fold a day's partition into a year-to-date
    * rollup without re-reading the year. The oracle is the full
    * recompute over all rows, so the hash gate IS the merge-equals-
    * recompute proof. At 100 TB the base side is a materialized
    * artifact (group-key-sized), the delta scan is one pushed-down
    * date partition, and the merge join is aggregate-sized — the raw
    * history is never touched.
    */
  def incrementalAgg(s: SparkSession, d: String): DataFrame = {
    // raw-column boundary -> PushedFilters on both branch scans (q6
    // lesson); 2001-01-01 is the "new batch" cutoff
    val cut = expr("TIMESTAMP_NTZ '2001-01-01 00:00:00'")
    val o = Tables.orders(s, d).select(col("o_orderpriority").as("prio"),
      col("o_orderdate"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    def aggOf(df: DataFrame) = df.groupBy(col("prio"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
    val base = aggOf(o.filter(col("o_orderdate") < cut))
      .select(col("prio").as("bp"), col("n").as("bn"), col("c").as("bc"))
    val delta = aggOf(o.filter(col("o_orderdate") >= cut))
      .select(col("prio").as("dp"), col("n").as("dn"), col("c").as("dc"))
    base.join(delta, col("bp") === col("dp"), "full_outer")
      .select(coalesce(col("bp"), col("dp")).as("o_orderpriority"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
        (coalesce(col("bc"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("total_cents"))
      .orderBy(col("o_orderpriority"))
  }

  /** Aggregation-tree reuse: the monthly rollup derived FROM the daily
    * aggregate (sum of sums), not from raw rows — the vertical
    * complement of [[incrementalAgg]]'s horizontal merge. The oracle
    * computes monthly directly from the raw table; hash equality is
    * the rollup-reuse identity (sum is decomposable — the reason
    * aggregation trees exist). At 100 TB the daily table is ~5 orders
    * of magnitude smaller than raw: deriving months, quarters, and
    * years from it is the difference between scanning gigabytes and
    * scanning the lake.
    */
  def rollupReuse(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .select(col("o_orderpriority").as("prio"),
        expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000").as("day"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("ym"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("prio"), col("day"), col("ym"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
    daily.groupBy(col("prio"), col("ym"))
      .agg(sum(col("n")).as("n_orders"), sum(col("c")).as("total_cents"))
      .select(col("prio").as("o_orderpriority"), col("ym").cast("int").as("ym"),
        col("n_orders"), col("total_cents"))
      .orderBy(col("o_orderpriority"), col("ym"))
  }

  // --- registration -----------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "incremental_agg" -> incrementalAgg,
    "rollup_reuse" -> rollupReuse,
    "snapshot_diff" -> snapshotDiff,
    "ewma_features" -> ewmaFeatures,
    "funnel" -> funnel,
    "window_distinct" -> windowDistinct,
    "asof_nearest" -> asofNearest,
    "merge_upsert" -> mergeUpsert,
    "scd2_build" -> scd2Build,
    "scd2_lookup" -> scd2Lookup,
    "transition_matrix" -> transitionMatrix,
    "transition_entropy" -> transitionEntropy,
    "attribution" -> attribution,
    "event_paths" -> eventPaths,
    "locf_fill" -> locfFill,
  )

  def oracleSql: Map[String, String] = Map(
    // the full recompute over ALL rows: hash equality proves the
    // base+delta merge reproduces it exactly
    "incremental_agg" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS total_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // monthly direct from raw: hash equality proves the daily->monthly
    // rollup reuse (sum-of-sums) is exact
    "rollup_reuse" ->
      """SELECT o_orderpriority, (year(o_orderdate) * 100 + month(o_orderdate))::INT AS ym,
        |  count(*)::BIGINT AS n_orders,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS total_cents
        |FROM orders GROUP BY 1, 2 ORDER BY o_orderpriority, ym""".stripMargin,
    "attribution" ->
      """WITH ev AS (SELECT user_id, event_type, event_id,
        |    epoch_ms(ts) AS ts_ms FROM events),
        |t AS (SELECT event_type,
        |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |        IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts_ms, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |        IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts_ms, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
        |  FROM ev),
        |p AS (SELECT * FROM t WHERE event_type = 'purchase')
        |SELECT model, touch, n_purchases FROM (
        |  SELECT 'first_touch' AS model, coalesce(ft, 'none') AS touch,
        |    count(*)::BIGINT AS n_purchases FROM p GROUP BY 2
        |  UNION ALL
        |  SELECT 'last_touch', coalesce(lt, 'none'), count(*)::BIGINT
        |  FROM p GROUP BY 2)
        |ORDER BY model, touch""".stripMargin,
    "ewma_features" ->
      """WITH RECURSIVE ev AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |r AS (SELECT user_id, event_id, cents,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts_ms, event_id) AS rn FROM ev),
        |w AS (SELECT user_id, event_id, cents, rn, cents AS ewma FROM r WHERE rn = 1
        |      UNION ALL
        |      SELECT r.user_id, r.event_id, r.cents, r.rn, (r.cents + w.ewma) // 2
        |      FROM r JOIN w ON r.user_id = w.user_id AND r.rn = w.rn + 1)
        |SELECT event_id, user_id, cents, ewma AS ewma_cents
        |FROM w ORDER BY event_id""".stripMargin,
    "snapshot_diff" ->
      """WITH base AS (SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |old AS (SELECT k, cents AS old_cents FROM base WHERE k % 10 <> 0),
        |neu AS (SELECT k, CASE WHEN k % 5 = 0 THEN cents + 1 ELSE cents END
        |          AS new_cents FROM base WHERE k % 7 <> 0),
        |j AS (SELECT coalesce(old.k, neu.k) AS k, old_cents, new_cents,
        |        CASE WHEN old_cents IS NULL THEN 'added'
        |             WHEN new_cents IS NULL THEN 'removed'
        |             WHEN old_cents <> new_cents THEN 'changed'
        |             ELSE 'unchanged' END AS status
        |      FROM old FULL OUTER JOIN neu ON old.k = neu.k)
        |SELECT k, status, old_cents, new_cents FROM j
        |WHERE status <> 'unchanged' ORDER BY k""".stripMargin,
    "funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        |v AS (SELECT user_id, min(ts_ms) AS view_ms FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts_ms) AS click_ms FROM ev e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts_ms >= v.view_ms GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts_ms) AS purchase_ms FROM ev e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts_ms >= c.click_ms GROUP BY 1)
        |SELECT (SELECT count(DISTINCT user_id) FROM ev)::BIGINT AS n_users,
        |       (SELECT count(*) FROM v)::BIGINT AS n_view,
        |       (SELECT count(*) FROM c)::BIGINT AS n_click,
        |       (SELECT count(*) FROM p)::BIGINT AS n_purchase""".stripMargin,
    "window_distinct" ->
      """SELECT event_id,
        |  count(DISTINCT user_id) OVER (ORDER BY epoch_ms(ts)
        |    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)::BIGINT AS du
        |FROM events ORDER BY event_id""".stripMargin,
    "asof_nearest" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        |su AS (SELECT user_id, ts_ms, min(event_id) AS b_id FROM ev
        |       WHERE event_type = 'signup' GROUP BY 1, 2),
        |er AS (SELECT user_id, event_id, ts_ms FROM ev WHERE event_type = 'error'),
        |b AS (SELECT er.user_id, er.event_id, er.ts_ms, su.ts_ms AS bts, su.b_id AS bid
        |      FROM er ASOF LEFT JOIN su
        |        ON er.user_id = su.user_id AND er.ts_ms >= su.ts_ms),
        |f AS (SELECT er.user_id, er.event_id, su.ts_ms AS fts, su.b_id AS fid
        |      FROM er ASOF LEFT JOIN su
        |        ON er.user_id = su.user_id AND er.ts_ms <= su.ts_ms)
        |SELECT b.user_id, b.event_id, b.ts_ms,
        |  CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
        |       WHEN fts IS NULL THEN bid
        |       WHEN bts IS NULL THEN fid
        |       WHEN (b.ts_ms - bts) <= (fts - b.ts_ms) THEN bid ELSE fid END AS signup_id,
        |  CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
        |       WHEN fts IS NULL THEN b.ts_ms - bts
        |       WHEN bts IS NULL THEN fts - b.ts_ms
        |       WHEN (b.ts_ms - bts) <= (fts - b.ts_ms) THEN b.ts_ms - bts
        |       ELSE fts - b.ts_ms END AS delta_ms
        |FROM b JOIN f USING (user_id, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "merge_upsert" ->
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS b_status,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS b_cents FROM orders),
        |changes AS (
        |  SELECT k, 'U' AS c_status, b_cents + 100 AS c_cents FROM base WHERE k % 7 = 0
        |  UNION ALL
        |  SELECT -k - 1, 'N', 9999 FROM base WHERE k % 997 = 0),
        |m AS (
        |  SELECT CASE WHEN b.k IS NULL THEN 'insert'
        |              WHEN c.k IS NULL THEN 'keep' ELSE 'update' END AS action,
        |    coalesce(c.c_status, b.b_status) AS status,
        |    coalesce(c.c_cents, b.b_cents) AS cents
        |  FROM base b FULL OUTER JOIN changes c ON b.k = c.k)
        |SELECT action, status, count(*)::BIGINT AS n, sum(cents)::BIGINT AS sum_cents
        |FROM m GROUP BY 1, 2 ORDER BY action, status""".stripMargin,
    "scd2_build" ->
      """WITH o AS (SELECT o_custkey AS cust, o_orderkey AS ok,
        |    (o_orderdate::DATE - DATE '1970-01-01')::BIGINT AS day,
        |    o_orderstatus AS st FROM orders),
        |r AS (SELECT *, CASE WHEN lag(st) OVER w IS NULL OR lag(st) OVER w <> st
        |                     THEN 1 ELSE 0 END AS chg
        |      FROM o WINDOW w AS (PARTITION BY cust ORDER BY day, ok)),
        |v0 AS (SELECT *, sum(chg) OVER (PARTITION BY cust ORDER BY day, ok
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS ver
        |       FROM r),
        |v AS (SELECT cust, ver, st, min(day)::BIGINT AS from_day,
        |        count(*)::BIGINT AS n_orders
        |      FROM v0 GROUP BY 1, 2, 3)
        |SELECT cust, ver, st, from_day,
        |  lead(from_day) OVER (PARTITION BY cust ORDER BY ver) AS to_day, n_orders
        |FROM v ORDER BY cust, ver""".stripMargin,
    // shares scd2_build's CTE text verbatim (the Spark side shares
    // scd2Build the same way — neither can drift alone)
    "scd2_lookup" ->
      """WITH o AS (SELECT o_custkey AS cust, o_orderkey AS ok,
        |    (o_orderdate::DATE - DATE '1970-01-01')::BIGINT AS day,
        |    o_orderstatus AS st FROM orders),
        |r AS (SELECT *, CASE WHEN lag(st) OVER w IS NULL OR lag(st) OVER w <> st
        |                     THEN 1 ELSE 0 END AS chg
        |      FROM o WINDOW w AS (PARTITION BY cust ORDER BY day, ok)),
        |v0 AS (SELECT *, sum(chg) OVER (PARTITION BY cust ORDER BY day, ok
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS ver
        |       FROM r),
        |v AS (SELECT cust, ver, st, min(day)::BIGINT AS from_day
        |      FROM v0 GROUP BY 1, 2, 3),
        |scd AS (SELECT cust, st, from_day,
        |          lead(from_day) OVER (PARTITION BY cust ORDER BY ver) AS to_day
        |        FROM v),
        |f AS (SELECT (l_shipdate::DATE - DATE '1970-01-01')::BIGINT AS ship_day,
        |        o_custkey, o_orderstatus
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderstatus, coalesce(scd.st, 'none') AS asof_st,
        |  count(*)::BIGINT AS n_lines
        |FROM f LEFT JOIN scd ON o_custkey = cust
        |  AND ship_day >= from_day AND (to_day IS NULL OR ship_day < to_day)
        |GROUP BY 1, 2 ORDER BY o_orderstatus, asof_st""".stripMargin,
    "transition_entropy" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        |st AS (SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS nxt
        |  FROM ev),
        |c AS (SELECT cur, nxt, count(*)::BIGINT AS c FROM st WHERE nxt IS NOT NULL
        |      GROUP BY 1, 2),
        |t AS (SELECT cur, sum(c)::BIGINT AS n FROM c GROUP BY 1),
        |h AS (SELECT c.cur, t.n,
        |        sum(CAST(round(-1e9 * (c.c::DOUBLE / t.n)
        |          * ln(c.c::DOUBLE / t.n)) AS BIGINT))::BIGINT AS h_nano
        |      FROM c JOIN t USING (cur) GROUP BY 1, 2)
        |SELECT cur, n AS n_trans, h_nano,
        |  CAST(round(1000 * exp(h_nano::DOUBLE / 1e9)) AS BIGINT)
        |    AS eff_branching_milli
        |FROM h ORDER BY cur""".stripMargin,
    "transition_matrix" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        |st AS (SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS nxt
        |  FROM ev),
        |c AS (SELECT cur, nxt, count(*)::BIGINT AS n FROM st WHERE nxt IS NOT NULL
        |      GROUP BY 1, 2),
        |t AS (SELECT cur, sum(n)::BIGINT AS total FROM c GROUP BY 1)
        |SELECT c.cur, c.nxt, c.n, round(c.n::DOUBLE / t.total, 6) AS p
        |FROM c JOIN t USING (cur) ORDER BY cur, nxt""".stripMargin,
    "event_paths" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        |g AS (SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
        |                       OR ts_ms - lag(ts_ms) OVER w > 1800000
        |                     THEN 1 ELSE 0 END AS gap
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        |s AS (SELECT *, sum(gap) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM g),
        |p AS (SELECT user_id, sess,
        |        string_agg(event_type, '>' ORDER BY ts_ms, event_id) AS path
        |      FROM s GROUP BY 1, 2)
        |SELECT path, count(*)::BIGINT AS n FROM p
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "locf_fill" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |SELECT event_id,
        |  last_value(CASE WHEN event_type = 'purchase' THEN cents END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_cents
        |FROM ev ORDER BY event_id""".stripMargin,
  )
}
