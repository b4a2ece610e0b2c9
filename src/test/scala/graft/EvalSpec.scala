package graft

/** The eval battery ([[graft.queries.Eval]]): pass@k must equal the
  * exact binomial estimator computed with BigInt combinatorics (an
  * INDEPENDENT formulation — falling-factorial floor vs true C(n,k)
  * ratio), the degenerate cases must hold, and the planted difficulty
  * ladder must surface as monotone class means.
  */
class EvalSpec extends SparkSuite {

  private def comb(n: Long, k: Long): BigInt =
    if (k < 0 || k > n) BigInt(0)
    else (0L until k).map(i => BigInt(n - i)).product /
      (1L to k).map(BigInt(_)).product

  private def passBp(n: Long, c: Long, k: Long): Long =
    (10000 - BigInt(10000) * comb(n - c, k) / comb(n, k)).toLong

  test("pass@k equals the BigInt combinatorial estimator per task") {
    val rows = SparkEntry.queries("pass_at_k")(spark, sf0001).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val (id, n, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(n == 10)
      // success rule recompute
      val want = (0L until 10L).count { a =>
        val doc = id * 10 + a
        (doc * 48271) % 100 < 20 + 10 * (id % 7)
      }
      assert(c == want, s"task $id: c=$c recompute=$want")
      assert(r.getLong(3) == passBp(n, c, 1), s"task $id pass@1")
      assert(r.getLong(4) == passBp(n, c, 5), s"task $id pass@5")
      assert(r.getLong(5) == passBp(n, c, 10), s"task $id pass@10")
      // degenerate contracts: any success => pass@10 = 1; none => 0
      assert(r.getLong(5) == (if (c > 0) 10000L else 0L))
    }
  }

  test("difficulty census folds tasks; planted ladder is monotone") {
    val tasks = SparkEntry.queries("pass_at_k")(spark, sf0001).collect()
      .map(r => (r.getLong(0) % 7, r.getLong(2), r.getLong(4)))
    val rows = SparkEntry.queries("passk_by_difficulty")(spark, sf0001)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 6L))
    rows.foreach { r =>
      val mine = tasks.filter(_._1 == r.getLong(0))
      assert(r.getLong(1) == mine.length)
      assert(r.getLong(3) == mine.map(_._2).sum)
      assert(r.getLong(5) == mine.map(_._3).sum / mine.length)
    }
    val meanC = rows.map(r => r.getLong(3).toDouble / r.getLong(1))
    assert(meanC.zip(meanC.tail).forall { case (a, b) => a < b },
      s"planted success ladder not strictly increasing: ${meanC.toSeq}")
  }
}
