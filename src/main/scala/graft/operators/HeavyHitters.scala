package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Two-pass distributed heavy hitters (Misra-Gries 1982 candidates +
  * exact verification) — the bounded-memory alternative to a
  * full-cardinality groupBy for "which keys exceed an N/k frequency
  * threshold" screens (boilerplate phrases, hot join keys, spam
  * sources):
  *
  *   - PASS 1 (candidates): each partition runs a Misra-Gries summary
  *     with k counters over its local stream — O(k) memory per task,
  *     and the shuffle that follows carries at most tasks × k candidate
  *     rows instead of the full key cardinality. The classical
  *     guarantee composes across partitions by pigeonhole: any key with
  *     GLOBAL count > N/(k+1) must exceed N_p/(k+1) in at least one
  *     partition and therefore survives that partition's summary, so
  *     the candidate union is a SUPERSET of the true heavy hitters.
  *   - PASS 2 (verify): exact counts of the candidate keys only — the
  *     candidate set broadcasts, so the second scan's aggregate state is
  *     candidate-bounded, and the final filter `count > N div k` makes
  *     the output EXACTLY the keys above threshold (deterministic and
  *     partitioning-invariant, whatever superset pass 1 produced — the
  *     same closure trick that makes the LSH verify stage oracle-able).
  *
  * `count > N div k` implies count ≥ floor(N/k)+1 > N/k > N/(k+1), so
  * every reported key is inside the MG survival bound — no true heavy
  * hitter can be missed. The reference engine has no sketch surface
  * (SURVEY.md §2 tier A′); north-star scope alongside the HLL family.
  */
object HeavyHitters {

  /** Pass 1: per-partition Misra-Gries summaries (≤ k counters per
    * partition, emitted as (key, residual count)). Classic
    * decrement-all eviction: a new key arriving at a full summary
    * decrements every counter and drops zeros.
    */
  private[graft] def mgSummaries(items: Dataset[String], k: Int): DataFrame = {
    require(k >= 1)
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      val counters = new scala.collection.mutable.HashMap[String, Long]()
      while (it.hasNext) {
        val x = it.next()
        counters.get(x) match {
          case Some(c) => counters.update(x, c + 1)
          case None =>
            if (counters.size < k) counters.update(x, 1L)
            else {
              val dec = counters.iterator
                .map { case (key, c) => (key, c - 1) }.toList
              counters.clear()
              dec.foreach { case (key, c) => if (c > 0) counters.update(key, c) }
            }
        }
      }
      counters.iterator
    }.toDF("cand", "c")
  }

  private[graft] def mgCandidates(items: Dataset[String], k: Int): DataFrame =
    mgSummaries(items, k).select(col("cand"))

  /** Merge two MG summaries at size k (Agarwal et al., "Mergeable
    * Summaries", 2012): sum counters key-wise; if more than k keys
    * survive, subtract the (k+1)-th largest count from all and drop the
    * non-positive — the result is a valid MG summary of the combined
    * stream (total undercount stays ≤ N/(k+1)), which is what lets
    * per-partition and per-BATCH summaries combine associatively.
    */
  private def trim(m: Map[String, Long], k: Int): Map[String, Long] =
    if (m.size <= k) m
    else {
      val t = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
      m.collect { case (x, c) if c - t > 0 => x -> (c - t) }
    }

  def merge(a: Map[String, Long], b: Map[String, Long],
      k: Int): Map[String, Long] =
    trim((a.keySet ++ b.keySet).iterator
      .map(x => x -> (a.getOrElse(x, 0L) + b.getOrElse(x, 0L))).toMap, k)

  /** One bounded MG summary (≤ k counters) of the whole dataset: the
    * per-partition summaries key-wise summed on the driver (tasks × k
    * rows — the bounded BPE-trainer driver-fold posture) and trimmed
    * ONCE to k.
    */
  def summarize(items: Dataset[String], k: Int): Map[String, Long] = {
    val rows = mgSummaries(items, k).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    trim(rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap, k)
  }

  /** Pass 2: exact counts of the broadcast candidate keys AND the total
    * N in the same scan, closed with the `count > N div k` threshold —
    * the output is exactly the keys above threshold whenever `cands` is
    * a superset of them (which both the batch MG pass and the maintained
    * streaming summary guarantee). The LEFT join keeps non-candidate
    * rows in a single null-key group, so the grouped frame (≤ k+1 rows)
    * carries both the per-candidate counts and, as its row-count sum,
    * the exact N — one evaluation of `items`, not a separate total
    * aggregate. The total is read back with an unpartitioned window over
    * that k-bounded frame (bounded by declaration, like the rich_club
    * ladder — never data-sized).
    */
  def verified(items: Dataset[String], cands: DataFrame, k: Int): DataFrame = {
    items.toDF("item")
      .join(broadcast(cands.select(col("cand")).distinct()),
        col("item") === col("cand"), "left")
      .groupBy(col("cand")).agg(count(lit(1)).as("cnt"))
      .withColumn("n", sum(col("cnt")).over())
      .filter(col("cand").isNotNull && col("cnt") > expr(s"n div $k"))
      .select(col("cand").as("item"), col("cnt"))
      .orderBy(col("item"))
  }

  /** The exact keys with count > N div k, computed at O(k)-bounded task
    * memory via the two-pass shape above. Output: (item, cnt), ordered
    * by item. The input is evaluated twice — the MG candidate pass and
    * the count-and-total verify pass (the declared cost of the shape);
    * persist upstream if the stream is expensive to recompute.
    */
  def topOver(items: Dataset[String], k: Int): DataFrame =
    verified(items, mgCandidates(items, k), k)
}
