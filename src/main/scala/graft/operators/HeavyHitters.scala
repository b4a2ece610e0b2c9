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

  /** Pass 1: per-partition Misra-Gries candidate keys (≤ k per
    * partition). Classic decrement-all eviction: a new key arriving at
    * a full summary decrements every counter and drops zeros.
    */
  private[graft] def mgCandidates(items: Dataset[String], k: Int): DataFrame = {
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
      counters.keysIterator
    }.toDF("cand")
  }

  /** The exact keys with count > N div k, computed at O(k)-bounded task
    * memory via the two-pass shape above. Output: (item, cnt), ordered
    * by item. The input is evaluated twice (the declared cost of the
    * shape); persist upstream if the stream is expensive to recompute.
    */
  def topOver(items: Dataset[String], k: Int): DataFrame = {
    val cands = mgCandidates(items, k).distinct()
    val tot = items.toDF("x").agg(count(lit(1)).as("n"))
    items.toDF("item")
      .join(broadcast(cands), col("item") === col("cand"))
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .filter(col("cnt") > expr(s"n div $k"))
      .select(col("item"), col("cnt"))
      .orderBy(col("item"))
  }
}
