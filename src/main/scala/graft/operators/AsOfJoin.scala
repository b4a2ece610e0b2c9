package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every probe row, the most recent build row with
  * `build.ts <= probe.ts` within the same key (inclusive; classic
  * time-series point-in-time join).
  *
  * Spark has no as-of operator; the naive formulation (range predicate +
  * row_number) is a nested-loop hazard like any range join. This is the
  * compose-built-ins implementation (brief preference (a)): union the two
  * sides tagged, ONE shuffle-sort by (key, ts, side), and carry the build
  * payload forward with `last(_, ignoreNulls)` over the running frame.
  * O(n log n) in the partition sort, no joins at all; skew follows the
  * key distribution exactly like any window.
  *
  * Ordering detail: at equal ts the build row must sort BEFORE the probe
  * row so `ts >= build.ts` is inclusive — the union adds `__side`
  * (build=0, probe=1) as the tie-break.
  */
object AsOfJoin {

  /** probe(keyCol, tsCol, ...) x build(keyCol, tsCol, payloadCol) ->
    * probe columns + `payloadCol` (null when no build row precedes).
    * `tsCol` must be long-typed on both sides.
    */
  def lastValue(probe: DataFrame, build: DataFrame,
      keyCol: String, tsCol: String, payloadCol: String): DataFrame = {
    require(!probe.columns.contains("__side") && !build.columns.contains("__side"),
      "AsOfJoin reserves the column name __side")
    require(!probe.columns.contains(payloadCol),
      s"probe already has a column named $payloadCol")
    val probeCols = probe.columns.toSeq
    val p = probe
      .withColumn("__side", lit(1))
      .withColumn(payloadCol, lit(null).cast(build.schema(payloadCol).dataType))
    val b = build.select(col(keyCol), col(tsCol), col(payloadCol))
      .withColumn("__side", lit(0))
    val unioned = p.select((probeCols :+ "__side" :+ payloadCol).map(col): _*)
      .unionByName(b, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn(payloadCol, last(col(payloadCol), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((probeCols :+ payloadCol).map(col): _*)
  }
}
