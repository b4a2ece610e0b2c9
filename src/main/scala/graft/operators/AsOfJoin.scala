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
    * probe columns + `payloadCol` (null only when NO build row precedes —
    * a matched build row whose payload is null yields null, not an older
    * value: the carry wraps the payload in a struct so `last(ignoreNulls)`
    * distinguishes "no build row" from "null payload").
    * `tsCol` must be long-typed on both sides.
    *
    * Determinism: among build rows sharing (key, ts) the greatest payload
    * wins (the window tie-breaks on the wrapped payload) — without this,
    * duplicate build timestamps leave the result partition-order-dependent.
    */
  def lastValue(probe: DataFrame, build: DataFrame,
      keyCol: String, tsCol: String, payloadCol: String): DataFrame = {
    val reserved = Seq("__side", "__pay")
    require(reserved.forall(r => !probe.columns.contains(r) && !build.columns.contains(r)),
      "AsOfJoin reserves the column names __side and __pay")
    require(!probe.columns.contains(payloadCol),
      s"probe already has a column named $payloadCol")
    val probeCols = probe.columns.toSeq
    val payType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", build.schema(payloadCol).dataType)))
    val p = probe
      .withColumn("__side", lit(1))
      .withColumn("__pay", lit(null).cast(payType))
    val b = build.select(col(keyCol), col(tsCol),
        struct(col(payloadCol).as("v")).as("__pay"))
      .withColumn("__side", lit(0))
    val unioned = p.select((probeCols :+ "__side" :+ "__pay").map(col): _*)
      .unionByName(b, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn(payloadCol, col("__pay.v"))
      .select((probeCols :+ payloadCol).map(col): _*)
  }

  /** Forward as-of: for every probe row, the NEAREST build row with
    * `build.ts >= probe.ts` (inclusive) within the same key — the mirror
    * of [[lastValue]], same single shuffle-sort + carry, with the frame
    * running forward (`first` over [current, unbounded following]) and
    * the side tie-break flipped so an equal-ts build row is visible to
    * its probe. Among build rows sharing (key, ts) the SMALLEST payload
    * wins (first in __pay order) — deterministic like lastValue.
    */
  def nextValue(probe: DataFrame, build: DataFrame,
      keyCol: String, tsCol: String, payloadCol: String): DataFrame = {
    val reserved = Seq("__side", "__pay")
    require(reserved.forall(r => !probe.columns.contains(r) && !build.columns.contains(r)),
      "AsOfJoin reserves the column names __side and __pay")
    require(!probe.columns.contains(payloadCol),
      s"probe already has a column named $payloadCol")
    val probeCols = probe.columns.toSeq
    val payType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", build.schema(payloadCol).dataType)))
    val p = probe
      .withColumn("__side", lit(0)) // probe first at equal ts: build stays in frame
      .withColumn("__pay", lit(null).cast(payType))
    val b = build.select(col(keyCol), col(tsCol),
        struct(col(payloadCol).as("v")).as("__pay"))
      .withColumn("__side", lit(1))
    val unioned = p.select((probeCols :+ "__side" :+ "__pay").map(col): _*)
      .unionByName(b, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col("__pay"))
      .rowsBetween(0, Window.unboundedFollowing)
    unioned
      .withColumn("__pay", first(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .withColumn(payloadCol, col("__pay.v"))
      .select((probeCols :+ payloadCol).map(col): _*)
  }
}
