package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for every probe row, the nearest build row at or before
  * ([[lastValue]]) / at or after ([[nextValue]]) its timestamp within the
  * same key (both inclusive; classic time-series point-in-time joins).
  *
  * Spark has no as-of operator; the naive formulation (range predicate +
  * row_number) is a nested-loop hazard like any range join. This is the
  * compose-built-ins implementation (brief preference (a)): union the two
  * sides tagged, ONE shuffle-sort by (key, ts, side), and carry the build
  * payload across the running frame with `last`/`first` over
  * `ignoreNulls`. O(n log n) in the partition sort, no joins at all; skew
  * follows the key distribution exactly like any window.
  *
  * Ordering details (shared impl, direction-flipped):
  *   - backward: at equal ts the build row sorts BEFORE the probe row so
  *     `probe.ts >= build.ts` is inclusive; among build rows sharing
  *     (key, ts) the GREATEST payload wins (the frame's `last`).
  *   - forward: at equal ts the probe row sorts BEFORE the build row so
  *     the build row is inside the following frame; among duplicates the
  *     SMALLEST payload wins (the frame's `first`).
  *   Either way the duplicate-ts winner is deterministic — without the
  *   __pay tie-break the result would be partition-order-dependent.
  */
object AsOfJoin {

  /** probe(keyCol, tsCol, ...) x build(keyCol, tsCol, payloadCol) ->
    * probe columns + `payloadCol` from the most recent build row with
    * `build.ts <= probe.ts` (null only when NO build row precedes — a
    * matched build row whose payload is null yields null, not an older
    * value: the carry wraps the payload in a struct so ignoreNulls
    * distinguishes "no build row" from "null payload").
    * `tsCol` must be long-typed on both sides.
    */
  def lastValue(probe: DataFrame, build: DataFrame,
      keyCol: String, tsCol: String, payloadCol: String): DataFrame =
    asOf(probe, build, keyCol, tsCol, payloadCol, forward = false)

  /** Forward mirror of [[lastValue]]: the NEAREST build row with
    * `build.ts >= probe.ts` (inclusive).
    */
  def nextValue(probe: DataFrame, build: DataFrame,
      keyCol: String, tsCol: String, payloadCol: String): DataFrame =
    asOf(probe, build, keyCol, tsCol, payloadCol, forward = true)

  private def asOf(probe: DataFrame, build: DataFrame,
      keyCol: String, tsCol: String, payloadCol: String, forward: Boolean): DataFrame = {
    val reserved = Seq("__side", "__pay")
    require(reserved.forall(r => !probe.columns.contains(r) && !build.columns.contains(r)),
      "AsOfJoin reserves the column names __side and __pay")
    require(!probe.columns.contains(payloadCol),
      s"probe already has a column named $payloadCol")
    val probeCols = probe.columns.toSeq
    // forward: probe first at equal ts (build stays inside the following
    // frame); backward: build first (build stays inside the running frame)
    val probeSide = if (forward) 0 else 1
    val payType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", build.schema(payloadCol).dataType)))
    val p = probe
      .withColumn("__side", lit(probeSide))
      .withColumn("__pay", lit(null).cast(payType))
    val b = build.select(col(keyCol), col(tsCol),
        struct(col(payloadCol).as("v")).as("__pay"))
      .withColumn("__side", lit(1 - probeSide))
    val unioned = p.select((probeCols :+ "__side" :+ "__pay").map(col): _*)
      .unionByName(b, allowMissingColumns = true)
    val ordered = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col("__pay"))
    val carried =
      if (forward)
        first(col("__pay"), ignoreNulls = true)
          .over(ordered.rowsBetween(0, Window.unboundedFollowing))
      else
        last(col("__pay"), ignoreNulls = true)
          .over(ordered.rowsBetween(Window.unboundedPreceding, 0))
    unioned
      .withColumn("__pay", carried)
      .filter(col("__side") === probeSide)
      .withColumn(payloadCol, col("__pay.v"))
      .select((probeCols :+ payloadCol).map(col): _*)
  }
}
