package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in BIGINT fixed-point arithmetic.
  *
  * Why integer: a double-summed rank would make the result depend on
  * Spark's (and DuckDB's) aggregation order — the repo-wide oracle gate
  * compares exact values, and 100 TB runs should be bit-reproducible
  * run-to-run too. All arithmetic is BIGINT with floor division
  * (`div`), so every engine computes the identical lattice:
  *
  *   r0(v)   = SCALE                       (= 1.0 in fixed-point)
  *   r_i(v)  = (15*SCALE)/100 + (85 * Σ_u→v  r_{i-1}(u) div deg(u)) / 100
  *
  * i.e. the standard d=0.85 update with per-term floors. Overflow bound:
  * total rank mass stays ≤ N*SCALE, so `85 * Σ` needs
  * `85*N*SCALE < 2^63` → N < ~1.08e8 nodes at SCALE=1e12; larger graphs
  * drop SCALE to 1e9 (N < ~1.08e11) — rank resolution trades off
  * against node count, both documented here rather than discovered as
  * an overflow at scale (Spark ANSI mode would throw, not wrap).
  *
  * Iteration mechanics follow [[Dedup.connectedComponents]]: the rank
  * table feeds the next round through an eager `localCheckpoint` (plan
  * doubles per round otherwise), previous rounds' blocks are released
  * eagerly, and the edge/degree tables persist across rounds. Per round
  * the cost is one join + one aggregate, both shuffling on node id —
  * the exact shape GraphX/Pregel executes, declared here in DataFrames
  * so AQE still re-plans skew (a celebrity node's incoming partition).
  */
object PageRank {

  val Scale = 1000000000000L // 1e12: rank 1.0 in fixed-point
  private val Jump = 15L * Scale / 100L

  /** edges: (src: BIGINT, dst: BIGINT), already symmetrized if the graph
    * is undirected; every node must appear as a src (guaranteed for
    * symmetrized graphs — dangling-node mass handling is out of scope
    * and rejected loudly below). Returns (node, r) after `iters` rounds.
    */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val e = edges.select(col("src"), col("dst")).persist()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d")).persist()
    val nNodes = deg.count() // materializes both persists
    require(nNodes < 108000000L,
      s"$nNodes nodes overflows 85*N*SCALE at SCALE=1e12; lower PageRank.Scale")
    // dangling check: a dst that never occurs as src would silently leak
    // rank mass; symmetrized inputs can't trigger this, a directed graph
    // wired in by mistake fails loudly instead of converging wrong
    val dangling = e.select(col("dst").as("src")).except(deg.select(col("src"))).count()
    require(dangling == 0, s"$dangling dangling nodes (dst never src): symmetrize first")
    var chk = deg.select(col("src").as("node"), lit(Scale).as("r")).localCheckpoint()
    var r = chk
    try {
      for (_ <- 1 to iters) {
        val next = e.join(r.withColumnRenamed("node", "src"), "src")
          .join(deg, "src")
          .select(col("dst"), expr("r div d").as("contrib"))
          .groupBy(col("dst"))
          .agg(sum(col("contrib")).as("c"))
          .select(col("dst").as("node"),
            (lit(Jump) + expr("(85 * c) div 100")).as("r"))
          .localCheckpoint()
        org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(chk)
        chk = next
        r = next
      }
      r
    } finally { e.unpersist(); deg.unpersist() }
  }
}
