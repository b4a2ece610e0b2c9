package graft

import org.apache.spark.sql.functions._

/** The preference battery ([[graft.queries.Preference]]): the
  * comparison construction must match a driver recompute exactly, every
  * census must fold the pair stream, Bradley–Terry must reproduce a
  * from-scratch driver MM solve bit-for-bit AND order the planted
  * strength classes, and the rater cards must equal their closed forms.
  */
class PreferenceSpec extends SparkSuite {

  private def driverPairs = {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def score(id: Long) =
      docs(id).drop(3).toLong % 5 * 400L + (id * 1103515245L + 12345L) % 1000L
    (0L until docs.size - 1).map { pid =>
      val (ia, ib) = (pid, pid + 1)
      (pid, docs(ia), docs(ib), score(ia), score(ib), score(ia) >= score(ib))
    }
  }

  test("pairs match the driver recompute exactly; matchup graph connected") {
    val want = driverPairs
    val got = SparkEntry.queries("preference_pairs")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.length == want.length && got.length == 499)
    assert(got.sortBy(_._1).toSeq == want)
    // mixed outcomes: upsets exist (a lower-strength side wins) and so
    // do deterministic blowouts — the graph BT needs
    assert(want.exists(p => !p._6) && want.exists(_._6))
    // the matchup graph must be CONNECTED — the property the earlier
    // (even, odd) pairing silently lost (10 disjoint 2-player
    // components, ratings unidentified across them)
    val adj = (want.map(p => (p._2, p._3)) ++ want.map(p => (p._3, p._2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seen = scala.collection.mutable.Set(adj.keys.head)
    var frontier = Set(adj.keys.head)
    while (frontier.nonEmpty) {
      frontier = frontier.flatMap(adj(_)).diff(seen)
      seen ++= frontier
    }
    assert(seen.size == adj.size,
      s"matchup graph disconnected: ${seen.size} of ${adj.size} reachable")
  }

  test("winrate and win_matrix fold the pair stream; matrix is symmetric") {
    val pairs = driverPairs
    val games = scala.collection.mutable.Map.empty[String, (Long, Long)]
    for ((_, a, b, _, _, aw) <- pairs) {
      val (ga, wa) = games.getOrElse(a, (0L, 0L))
      games(a) = (ga + 1, wa + (if (aw) 1 else 0))
      val (gb, wb) = games.getOrElse(b, (0L, 0L))
      games(b) = (gb + 1, wb + (if (aw) 0 else 1))
    }
    val wr = SparkEntry.queries("preference_winrate")(spark, sf0001).collect()
    assert(wr.map(_.getString(0)).toSet == games.keySet)
    wr.foreach { r =>
      val (g, w) = games(r.getString(0))
      assert((r.getLong(1), r.getLong(2)) == (g, w), s"${r.getString(0)}")
      assert(r.getLong(3) == 10000L * w / g)
    }
    val m = SparkEntry.queries("win_matrix")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    m.foreach { case ((i, j), (n, wi)) =>
      val (nj, wj) = m((j, i)) // every matchup present in both orientations
      assert(n == nj && wi + wj == n, s"asymmetric matchup $i vs $j")
    }
    // matrix marginals reproduce the per-player card
    games.foreach { case (p2, (g, w)) =>
      // toSeq first: collect on a Map with pair-typed results would
      // rebuild a Map and silently dedup rows sharing (n, wins)
      val row = m.toSeq.collect { case ((i, _), v) if i == p2 => v }
      assert(row.map(_._1).sum == g && row.map(_._2).sum == w)
    }
  }

  test("bradley_terry reproduces a from-scratch driver solve; classes ordered") {
    val pairs = driverPairs
    val edges = (pairs.map(p => ((p._2, p._3), if (p._6) 1L else 0L)) ++
      pairs.map(p => ((p._3, p._2), if (p._6) 0L else 1L)))
      .groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val players = edges.keys.map(_._1).toSeq.distinct.sorted
    val wins = players.map(i =>
      i -> edges.collect { case ((a, _), (_, w)) if a == i => w }.sum).toMap
    val K = players.size * 1000000L
    var p = players.map(_ -> 1000000L).toMap
    for (_ <- 1 to 25) {
      val raw = players.map { i =>
        val dSum = edges.collect { case ((a, j), (n, _)) if a == i =>
          n * 1000000000000L / (p(i) + p(j))
        }.sum
        i -> math.max(1000L, wins(i) * 1000000000000L / dSum)
      }.toMap
      val tot = raw.values.sum
      p = raw.map { case (i, v) => i -> math.max(1000L, v * K / tot) }
    }
    val got = SparkEntry.queries("bradley_terry")(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == p, "query ratings drifted from the driver MM solve")
    // the matchup graph is the source 20-cycle, so only the EXTREME
    // strength classes are structurally distinct: every class-4 player
    // (beats both neighbors) must outrate every class-0 player (loses
    // both), with the middle classes strictly between the extremes
    val byClass = got.groupBy(_._1.drop(3).toLong % 5).view
      .mapValues(v => v.values).toMap
    assert(byClass(4L).min > byClass(0L).max,
      s"class-4 floor ${byClass(4L).min} !> class-0 ceiling ${byClass(0L).max}")
    for (c <- 1L to 3L) {
      val mean = byClass(c).sum / byClass(c).size
      assert(mean > byClass(0L).max && mean < byClass(4L).min,
        s"class-$c mean $mean outside the extreme-class envelope")
    }
  }

  test("bt_calibration: exact recompute, complementary predictions, sane fit") {
    val pairs = driverPairs
    val edges = (pairs.map(p => ((p._2, p._3), if (p._6) 1L else 0L)) ++
      pairs.map(p => ((p._3, p._2), if (p._6) 0L else 1L)))
      .groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val players = edges.keys.map(_._1).toSeq.distinct.sorted
    val wins = players.map(i =>
      i -> edges.collect { case ((a, _), (_, w)) if a == i => w }.sum).toMap
    val K = players.size * 1000000L
    var p = players.map(_ -> 1000000L).toMap
    for (_ <- 1 to 25) {
      val raw = players.map { i =>
        val dSum = edges.collect { case ((a, j), (n, _)) if a == i =>
          n * 1000000000000L / (p(i) + p(j))
        }.sum
        i -> math.max(1000L, wins(i) * 1000000000000L / dSum)
      }.toMap
      val tot = raw.values.sum
      p = raw.map { case (i, v) => i -> math.max(1000L, v * K / tot) }
    }
    val got = SparkEntry.queries("bt_calibration")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == edges.keySet)
    got.foreach { case ((i, j), (n, obs, pred, err)) =>
      val (en, ew) = edges((i, j))
      assert(n == en && obs == 10000L * ew / en, s"$i vs $j: observed")
      assert(pred == 10000L * p(i) / (p(i) + p(j)), s"$i vs $j: predicted")
      assert(err == math.abs(pred - obs), s"$i vs $j: err")
    }
    // complementary matchup predictions sum to 1 modulo the bp floor
    got.keys.foreach { case (i, j) =>
      val sum = got((i, j))._3 + got((j, i))._3
      assert(sum == 10000L || sum == 9999L, s"$i/$j pred sum $sum")
    }
    // aggregate fit sanity: the model explains the cycle far better
    // than the no-skill 5000-bp predictor would
    val wErr = got.values.map(v => v._1 * v._4).sum / got.values.map(_._1).sum
    val wBase = got.values.map(v => v._1 * math.abs(v._2 - 5000L)).sum /
      got.values.map(_._1).sum
    assert(wErr < wBase,
      s"weighted calibration error $wErr not better than no-skill $wBase")
  }

  test("kappa and majority cards equal their closed forms") {
    val n = 499L
    val flips9 = (0L until n).count(_ % 9 == 0) // rater-2 flips = disagreements
    val k = SparkEntry.queries("preference_kappa")(spark, sf0001).collect()(0)
    assert(k.getLong(0) == n && k.getLong(1) == n - flips9)
    assert(k.getLong(2) == 10000L * (n - flips9) / n)
    assert(k.getLong(3) > 5000L && k.getLong(3) < 10000L,
      s"kappa_bp ${k.getLong(3)}: expected strong-but-imperfect agreement")
    val m = SparkEntry.queries("preference_majority")(spark, sf0001).collect()(0)
    val unan = (0L until n).count(i => i % 9 != 0 && i % 4 != 0)
    val overturned = (0L until n).count(_ % 36 == 0)
    assert(m.getLong(0) == n && m.getLong(1) == unan)
    assert(m.getLong(3) == overturned,
      "majority overturns rater 1 exactly where raters 2 and 3 both flip")
  }
}
