package graft

import org.apache.spark.sql.functions._

/** The dialogue battery ([[graft.queries.Dialogue]]): the drop rule
  * must equal the Safety gate's own drop set, the censuses must match a
  * driver recompute of the conversation structure, truncation must keep
  * exactly the longest budget-fitting suffix, and the packed text must
  * reassemble the kept turns verbatim.
  */
class DialogueSpec extends SparkSuite {

  /** Driver-side conversation model: conv -> surviving (turn_idx, role,
    * n_tok, text) in turn order.
    */
  private def model = {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.filter { case (id, _) => id % 7 != 0 && id % 11 != 0 }
      .map { case (id, t) =>
        val role = if (id % 5 % 2 == 0) "user" else "assistant"
        val n = t.split("[ \t\n\r]", -1).count(_.nonEmpty).toLong
        (id / 5, id % 5, role, n, t)
      }
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
  }

  /** Kept suffix under the 150-token budget, driver-side. */
  private def keptSuffix(turns: Seq[(Long, Long, String, Long, String)]) = {
    var acc = 0L
    turns.reverse.takeWhile { t => acc += t._4; acc <= 150L }.reverse
  }

  test("drop rule equals the Safety gate's own drop set") {
    val safety = SparkEntry.queries("badwords_filter")(spark, sf0001)
      .filter(col("kept")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val closed = (0L until 500L).filter(i => i % 7 != 0 && i % 11 != 0).toSet
    assert(safety == closed,
      "Safety plant drifted from the closed form Dialogue restates")
  }

  test("turn census matches the driver model; drops break alternation") {
    val m = model
    val rows = SparkEntry.queries("turn_census")(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSet == m.keySet)
    rows.foreach { r =>
      val turns = m(r.getLong(0))
      assert(r.getLong(1) == turns.size)
      assert(r.getLong(2) == turns.count(_._3 == "user"))
      assert(r.getLong(3) == turns.count(_._3 == "assistant"))
      assert(r.getLong(4) == turns.map(_._4).sum)
      val alt = turns.map(_._3).sliding(2).forall(p => p.distinct.size == p.size)
      assert(r.getBoolean(5) == alt, s"conv ${r.getLong(0)}: alternation")
    }
    // the plant must actually produce both intact and broken conversations
    assert(rows.exists(_.getBoolean(5)) && rows.exists(!_.getBoolean(5)))
  }

  test("truncation keeps exactly the longest budget-fitting suffix") {
    val m = model
    val rows = SparkEntry.queries("context_truncate")(spark, sf0001).collect()
    rows.foreach { r =>
      val turns = m(r.getLong(0))
      val kept = keptSuffix(turns)
      assert(r.getLong(1) == turns.size && r.getLong(2) == kept.size,
        s"conv ${r.getLong(0)}")
      assert(r.getLong(3) == kept.map(_._4).sum)
      assert(r.getLong(4) == turns.size - kept.size)
    }
    // the budget must bite somewhere and keep at least one turn everywhere
    assert(rows.exists(_.getLong(4) > 0) && rows.forall(_.getLong(2) > 0))
  }

  test("packed text reassembles the kept turns verbatim; mask folds roles") {
    val m = model
    val pack = SparkEntry.queries("conversation_pack")(spark, sf0001).collect()
    pack.foreach { r =>
      val kept = keptSuffix(m(r.getLong(0)))
      val want = kept.map(t => s"<${t._3}> ${t._5}").mkString(" ")
      assert(r.getString(1) == want, s"conv ${r.getLong(0)}: packed text")
      assert(r.getLong(2) == want.length.toLong)
      assert(r.getLong(3) == kept.map(_._4).sum && r.getLong(4) == kept.size)
    }
    val mask = SparkEntry.queries("sft_loss_mask")(spark, sf0001).collect()
    mask.foreach { r =>
      val kept = keptSuffix(m(r.getLong(0)))
      val train = kept.filter(_._3 == "assistant").map(_._4).sum
      val masked = kept.filter(_._3 == "user").map(_._4).sum
      assert((r.getLong(1), r.getLong(2)) == (train, masked))
      assert(r.getLong(3) == 10000L * train / (train + masked))
    }
  }
}
