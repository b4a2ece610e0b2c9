package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-correct range join: `probe.pt BETWEEN build.lo AND build.hi`.
  *
  * Spark plans a bare range predicate as BroadcastNestedLoopJoin —
  * O(|probe| x |build|) and a driver-memory hazard; at 100 TB that is the
  * canonical accidental cross join. This operator composes built-ins
  * instead (brief preference (a)): bucket both sides by fixed-width bins
  * of the range dimension, explode each build interval over the bins it
  * spans, equi-join on (keys..., bin), then re-check the exact predicate.
  * Work is O(|probe| + |build| x avg_span + |candidates|), all hash
  * shuffles, AQE-splittable.
  *
  * `binWidth` should be on the order of the typical interval length:
  * wider bins -> fewer replicas but more false candidates; narrower ->
  * the reverse.
  */
object RangeJoin {

  // A single pathological interval (open-ended sentinel hi, corrupt row)
  // must not materialize a ~2^31-element sequence and kill the job:
  // spans are hard-capped; an interval wider than maxSpanBins bins is a
  // data error for this operator and fails fast with a clear message.
  // An *inverted* interval (lo > hi) contains no points — it gets zero
  // bins, never a sequence(start > stop) (which Spark generates
  // DESCENDING, i.e. a giant array for a corrupt huge-lo row).
  private val maxSpanBins = 1000000L

  // integer `div`, not double division: epoch-scale longs must not pass
  // through a 53-bit mantissa.
  private def spanBins(lo: String, hi: String, binWidth: Long): Column =
    expr(
      s"""CASE WHEN (`$hi` div ${binWidth}L) < (`$lo` div ${binWidth}L)
         THEN CAST(array() AS ARRAY<BIGINT>)
         WHEN (`$hi` div ${binWidth}L) - (`$lo` div ${binWidth}L) > ${maxSpanBins}L
         THEN raise_error(concat('RangeJoin: interval spans > ',
              '$maxSpanBins bins; widen binWidth or clean the data'))
         ELSE sequence(`$lo` div ${binWidth}L, `$hi` div ${binWidth}L)
         END""".stripMargin.replaceAll("\n\\s*", " "))

  private def requireNoBin(df: DataFrame, who: String): Unit =
    require(!df.columns.contains("__bin"), s"RangeJoin.$who reserves the column name __bin")

  /** Inner range join. `probe` gains all `build` columns for rows where
    * `probe(pt)` ∈ [`build(lo)`, `build(hi)`] and the equi `keys` match.
    * All of pt/lo/hi must be long-typed (epoch ms, offsets, ...).
    */
  def binned(probe: DataFrame, build: DataFrame, keys: Seq[String],
      pt: String, lo: String, hi: String, binWidth: Long): DataFrame = {
    require(binWidth > 0)
    requireNoBin(probe, "binned"); requireNoBin(build, "binned")
    val probeB = probe.withColumn("__bin", expr(s"`$pt` div ${binWidth}L"))
    val buildB = build.withColumn("__bin", explode(spanBins(lo, hi, binWidth)))
    probeB.join(buildB, keys :+ "__bin")
      .filter(col(pt) >= col(lo) && col(pt) <= col(hi))
      .drop("__bin")
  }

  /** Interval-overlap inner join: left x right rows whose intervals
    * [lo1,hi1] and [lo2,hi2] intersect and whose `keys` match. Both sides
    * span-explode over their bins; a pair that shares several bins is
    * emitted exactly once via the first-shared-bin trick (keep only the
    * bin == max of the two lo-bins), so no distinct pass is needed.
    * Non-key column names must be disjoint across the two sides.
    */
  def overlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      lo1: String, hi1: String, lo2: String, hi2: String, binWidth: Long): DataFrame = {
    require(binWidth > 0)
    requireNoBin(left, "overlap"); requireNoBin(right, "overlap")
    val lB = left.withColumn("__bin", explode(spanBins(lo1, hi1, binWidth)))
    val rB = right.withColumn("__bin", explode(spanBins(lo2, hi2, binWidth)))
    lB.join(rB, keys :+ "__bin")
      .filter(col("__bin") === greatest(
        expr(s"`$lo1` div ${binWidth}L"), expr(s"`$lo2` div ${binWidth}L")))
      .filter(col(lo1) <= col(hi2) && col(lo2) <= col(hi1))
      .drop("__bin")
  }
}
