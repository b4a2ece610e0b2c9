package graft

import graft.queries.Core

/** Sanity checks per tier-B query (the full hash-compare against DuckDB is
  * the driver's Verify gate; tools/check_oracle.py replicates it locally).
  */
class CoreQueriesSpec extends SparkSuite {

  test("every declared query runs and returns rows at sf0.001") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    for ((name, fn) <- SparkEntry.queries) {
      val df = fn(spark, sf0001)
      // driver-sortable-output contract: the harness row-sorts results in
      // pandas, where array/map/struct cells are unhashable and crash the
      // gate (round-4 lesson: array_funcs2/lag_features/positional_index).
      // Complex values must be serialized to strings before leaving a query.
      val complex = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType]
          || f.dataType.isInstanceOf[MapType]
          || f.dataType.isInstanceOf[StructType] => f.name
      }
      assert(complex.isEmpty,
        s"query $name outputs driver-unsortable columns ${complex.mkString(",")}: " +
          "serialize arrays/maps/structs to strings (inverted_index pattern)")
      val n = df.count()
      assert(n > 0, s"query $name returned no rows")
    }
  }

  test("oracleSql only names declared queries") {
    val undeclared = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty, s"oracle without query: $undeclared")
  }

  test("wordcount_files matches the golden corpus invariant (21 x 5000)") {
    val rows = Core.wordcountFiles(spark, sf0001).collect()
    assert(rows.length == 21)
    assert(rows.forall(_.getLong(1) == 5000L))
    // total ORDER BY: ascending byte order, 'This' first
    assert(rows.head.getString(0) == "This")
  }

  test("top_k is the 20 highest-count tokens, ties broken by token") {
    val wc = Core.wordcount(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = wc.sortBy { case (t, c) => (-c, t) }.take(20).toSeq
    val got = Core.topK(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("partitioned_wc pids equal scalar djb2 % 10") {
    val rows = Core.partitionedWc(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == graft.functions.Djb2.partition(r.getString(1), 10).toLong)
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
