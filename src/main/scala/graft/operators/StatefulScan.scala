package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Per-key ordered stateful scan — the BATCH analog of Structured
  * Streaming's `flatMapGroupsWithState`, for per-key recurrences a
  * window frame cannot express (EWMA, exponential decay, compartment
  * models, anything where row t's value depends on row t−1's OUTPUT,
  * not its input).
  *
  * The naive formulations both die at 100 TB: `collect_list` per key
  * materializes whole groups in one buffer; a global sort + driver loop
  * isn't distributed at all. This operator runs the streaming shape in
  * batch: hash-repartition on the key, sort WITHIN partitions on
  * (key, order), then ONE `mapPartitions` pass that carries O(1) state
  * per live key and resets it on every key change — each task streams
  * its keys sequentially, all tasks run in parallel, and no group is
  * ever held in memory as a whole. (Reference analogue: the per-group
  * value-cursor walk of `mapreduce.c:169-188`, distributed.) Numeric
  * discipline is the caller's: the [[graft.queries.Journey]] EWMA uses
  * the exact-integer halving recurrence, so no float drift can
  * accumulate across a key's million-row history.
  *
  * REQUIRES (key, order) to be a total order within each key for
  * deterministic output, and a deterministic input plan (same caveat as
  * [[AssignIds]]). Per-key state must be O(1); per-key row volume only
  * bounds a TASK's sequential work, not memory.
  */
object StatefulScan {

  /** Run `step` over each key's rows in `order`. `step` receives the
    * carried state (`None` on a key's first row) and the input row, and
    * returns the new state plus the output row (which must match
    * `outSchema`).
    */
  /** The distributed layout stage: hash-clustered by key, sorted within
    * each partition on (key, order). Exposed so plan guards can assert
    * the shape (the mapPartitions seam hides it behind a Scan
    * ExistingRDD in the final plan, as with [[AssignIds.layout]]).
    */
  private[graft] def layout(df: DataFrame, key: String, order: Seq[Column]): DataFrame =
    df.repartition(col(key)).sortWithinPartitions(col(key) +: order: _*)

  def perKey[S](df: DataFrame, key: String, order: Seq[Column],
      outSchema: StructType)(step: (Option[S], Row) => (S, Row)): DataFrame = {
    val spark = df.sparkSession
    val laid = layout(df, key, order)
    val ki = df.schema.fieldIndex(key)
    val out = laid.rdd.mapPartitions { it =>
      var cur: Any = null
      var st: Option[S] = None
      it.map { row =>
        val k = row.get(ki)
        if (st.isEmpty || cur != k) { cur = k; st = None }
        val (s2, o) = step(st, row)
        st = Some(s2)
        o
      }
    }
    spark.createDataFrame(out, outSchema)
  }
}
