package graft

import graft.queries.{Journey, Quality}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Invariants for the second Journey/Quality batch: SCD2 history,
  * Markov transitions, k-NN doc graph.
  */
class Journey2Spec extends SparkSuite {

  test("scd2_build: intervals tile per customer and orders are conserved") {
    val rows = Journey.scd2Build(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
    val byCust = rows.groupBy(_._1)
    byCust.values.foreach { vs =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, "versions are 1..n")
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        val (a, b) = (pair(0), pair(1))
        assert(a._5.contains(b._4), "to_day of v == from_day of v+1")
        assert(a._3 != b._3, "consecutive versions must change status")
      }
      assert(sorted.last._5.isEmpty, "current version is open-ended")
    }
    val nOrders = spark.read.parquet(s"$sf0001/orders.parquet").count()
    assert(rows.map(_._6).sum == nOrders, "n_orders sums to the order count")
  }

  test("transition_matrix: step conservation and per-state probabilities sum to ~1") {
    val rows = Journey.transitionMatrix(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val ev = graft.streaming.Sessions.events(spark, sf0001)
    val nEvents = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    assert(rows.map(_._3).sum == nEvents - nUsers,
      "each user contributes (events-1) transitions")
    rows.groupBy(_._1).values.foreach { g =>
      val p = g.map(_._4).sum
      assert(math.abs(p - 1.0) < 1e-3, s"probabilities sum to $p")
    }
  }

  test("transition_entropy: nano-nat H matches a driver recompute from the matrix counts") {
    val counts = Journey.transitionMatrix(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expect = counts.groupBy(_._1).toSeq.sortBy(_._1).map { case (cur, g) =>
      val n = g.map(_._3).sum
      val h = g.map { case (_, _, c) =>
        math.round(-1e9 * (c.toDouble / n) * math.log(c.toDouble / n)) }.sum
      (cur, n, h, math.round(1000 * math.exp(h.toDouble / 1e9)))
    }
    val got = Journey.transitionEntropy(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    // entropy is bounded by the support: e^H can never exceed the number
    // of observed next-states (equality only at the uniform matrix)
    val support = counts.groupBy(_._1).map { case (k, g) => k -> g.length }
    got.foreach { case (cur, _, _, eb) =>
      assert(eb <= support(cur) * 1000L + 1,
        s"$cur: effective branching must not exceed support") }
  }

  test("neardup_knn: equals the window row_number formulation") {
    // independent formulation: exact Jaccard over string shingle sets +
    // window top-3 (the plan TopKPerGroup replaces at scale)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 500)
    val sets = graft.operators.Dedup.shingleHashSets(docs)
    val a = sets.select(col("doc_id").as("id1"), col("hs").as("hs1"))
    val b = sets.select(col("doc_id").as("id2"), col("hs").as("hs2"))
    val pairs = a.join(b, col("id1") < col("id2"))
      .withColumn("inter",
        graft.functions.SketchExprs.sortedIntersectCount(col("hs1"), col("hs2")))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("hs1")) + size(col("hs2")) - col("inter")), 6))
      .select(col("id1"), col("id2"), col("jaccard"))
    val sym = pairs.select(col("id1").as("doc_id"), col("id2").as("nbr"), col("jaccard"))
      .union(pairs.select(col("id2").as("doc_id"), col("id1").as("nbr"), col("jaccard")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("jaccard").desc, col("nbr"))
    val expect = sym.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("doc_id"), col("nbr"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Quality.neardupKnn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect)
    assert(got.groupBy(_._1).values.forall(_.size <= 3))
  }

  test("pareto_front: the sweep equals brute-force dominance on the full table") {
    // no p_partkey bound here — the bound in the declared query exists
    // only for the quadratic DuckDB oracle's sake
    val pts = spark.read.parquet(s"$sf0001/part.parquet")
      .select(round(col("p_retailprice") * 100).cast("long"), col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val g = pts.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val brute = g.filter { case (c, s) =>
      !g.exists { case (c2, s2) => c2 >= c && s2 >= s && (c2 > c || s2 > s) }
    }.toSet
    val p = spark.createDataFrame(g.toSeq).toDF("cents", "size")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("cents").desc)
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val sweep = p.withColumn("mx", max(col("size")).over(w))
      .filter(col("mx").isNull || col("size") > col("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sweep == brute)
    assert(sweep.nonEmpty)
  }

  test("ewma_features: stateful scan equals the driver replay and never global-sorts") {
    val ev = graft.streaming.Sessions.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = ev.groupBy(_._2).values.flatMap { rows =>
      var s = 0L
      rows.sortBy(r => (r._3, r._1)).zipWithIndex.map { case (r, i) =>
        s = if (i == 0) r._4 else (r._4 + s) / 2
        r._1 -> s
      }
    }.toMap
    val q = Journey.ewmaFeatures(spark, sf0001)
    val got = q.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.nonEmpty)
    assert(got == expect)
    // the scan must stay distributed — the mapPartitions seam hides the
    // layout behind Scan ExistingRDD (as with AssignIds), so guard the
    // exposed layout stage directly: hash clustering on the key + an
    // in-partition sort, never a global one
    val plan = graft.operators.StatefulScan.layout(
      graft.streaming.Sessions.events(spark, sf0001)
        .select(col("event_id"), col("user_id"), col("ts_ms")),
      "user_id", Seq(col("ts_ms"), col("event_id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(user_id"), plan.take(900))
    assert(plan.contains(", false, 0"), "in-partition sort expected:\n" + plan.take(900))
    assert(!plan.contains(", true, 0"), "no global sort in the layout:\n" + plan.take(900))
    assert(!plan.contains("SinglePartition"), plan.take(900))
  }

  test("incremental_agg / rollup_reuse: maintenance identities equal direct recomputes") {
    val ords = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_orderpriority",
        "unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS ms",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        "CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS ym")
      .collect()
    // merge(base<cutoff, delta>=cutoff) == aggregate over everything
    val expectAll = ords.groupBy(_.getString(0)).map { case (p, rs) =>
      p -> ((rs.length.toLong, rs.map(_.getLong(2)).sum)) }
    val gotInc = graft.queries.Journey.incrementalAgg(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotInc == expectAll)
    // the two branches partition history: every order is in exactly one
    val cutoff = 978307200000L
    assert(ords.count(_.getLong(1) < cutoff) + ords.count(_.getLong(1) >= cutoff)
      == ords.length)
    // monthly-from-daily == monthly-from-raw
    val expectYm = ords.groupBy(r => (r.getString(0), r.getInt(3)))
      .map { case (k, rs) => k -> ((rs.length.toLong, rs.map(_.getLong(2)).sum)) }
    val gotYm = graft.queries.Journey.rollupReuse(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getInt(1))) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(gotYm == expectYm)
  }

  test("scd2_lookup: as-of matches are unique per fact and reconcile to the fact count") {
    val rows = graft.queries.Journey.scd2Lookup(spark, sf0001).collect()
    val nLines = spark.read.parquet(s"$sf0001/lineitem.parquet").count()
    assert(rows.map(_.getLong(2)).sum == nLines,
      "LEFT as-of join must neither drop nor duplicate facts " +
        "(intervals disjoint, before-history -> 'none')")
    // driver recompute of the drift matrix
    val ords = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey",
        "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS day", "o_orderstatus")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2).toLong, r.getString(3))))
      .toMap
    // per-customer status versions in (day, orderkey) order
    val versions = ords.toSeq.groupBy(_._2._1).map { case (cust, os) =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      os.sortBy { case (ok, (_, day, _)) => (day, ok) }
        .foreach { case (_, (_, day, st)) =>
          if (runs.isEmpty || runs.last._1 != st) runs += ((st, day))
        }
      cust -> runs.toSeq
    }
    val expect = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("l_orderkey",
        "datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS ship_day").collect()
      .foreach { r =>
        val (cust, _, ostatus) = ords(r.getLong(0))
        val day = r.getInt(1).toLong
        val vs = versions(cust)
        val asof = vs.zipWithIndex.find { case ((_, from), i) =>
          day >= from && (i == vs.length - 1 || day < vs(i + 1)._2) }
          .map(_._1._1).getOrElse("none")
        expect((ostatus, asof)) += 1L
      }
    val got = rows.map(r => ((r.getString(0), r.getString(1))) -> r.getLong(2)).toMap
    assert(got == expect.toMap)
  }

  test("token_allocation: exact budget conservation and monotone allocations") {
    val rows = graft.queries.Curation.tokenAllocation(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sum == 100000L, "allocations must sum to the budget exactly")
    // largest-remainder is monotone: a bigger source never gets less
    for ((_, ni, ai) <- rows; (_, nj, aj) <- rows if ni > nj)
      assert(ai >= aj, s"monotonicity: $ni tokens -> $ai but $nj -> $aj")
  }
}
