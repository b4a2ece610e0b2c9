package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Guards against driver testdata regenerations silently changing
  * physical parquet encodings (FIXTURES.md §2). Round 8 lost 32 queries
  * and 45 specs to exactly this: `events.ts` flipped timestamp[ns] →
  * timestamp[us] between driver passes and the hard-coded `ts div`
  * projection died at analysis. These tests pin the contract that
  *
  *  1. every Tables loader resolves against the CURRENT footers with
  *     the expected column names,
  *  2. every raw time column has a physical type the shared
  *     [[Tables.epochUs]]/[[Tables.epochMs]] helpers accept, and
  *  3. the helpers are bit-exact across all three accepted branches,
  *
  * so the next drift fails HERE with a named assertion, not as a
  * 32-query analysis-time outage.
  */
class SchemaDriftSpec extends SparkSuite {

  private val expectedCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  test("every table loader resolves the current footers with the expected columns") {
    expectedCols.foreach { case (name, cols) =>
      val got = Tables(spark, sf0001, name).schema.fieldNames.toSeq
      assert(got == cols, s"$name: footer columns drifted: $got")
    }
  }

  test("every raw time column reads through the epoch helpers (next encoding drift fails here, not in 30 queries)") {
    // legacy TIMESTAMP(NANOS) footers only read under this flag; set it
    // exactly as Sessions.events does so the branch check sees the same
    // resolved type production code will
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val timeCols = Seq(("events", "ts"), ("orders", "o_orderdate"),
      ("lineitem", "l_shipdate"))
    timeCols.foreach { case (table, c) =>
      val df = Tables(spark, sf0001, table)
      val dt = df.schema(c).dataType
      // throws IllegalArgumentException with the table+column named if a
      // regeneration ships an encoding the helpers don't cover yet
      val us = withClue(s"$table.$c ($dt): ") {
        df.select(Tables.epochUs(c, dt).as("us")).agg(max(col("us")))
          .collect().head.getLong(0)
      }
      // sane epoch band (1990-2035 in micros — orders/lineitem carry
      // TPC-H-style 1990s dates, events 2024): catches a unit mix-up
      // (ns-as-us would land ~1000x outside) without pinning exact data
      assert(us > 631152000000000L && us < 2051222400000000L,
        s"$table.$c epochUs out of band: $us")
    }
  }

  test("non-time column types stay within what their consumer families handle") {
    // loose FAMILY checks, not exact pins: a benign widening (int32 ->
    // int64, float -> double) should not fail the suite, but a category
    // flip (value double -> string, props string -> struct) must fail
    // HERE with the column named rather than deep inside 20 queries
    def integral(dt: DataType) = dt == LongType || dt == IntegerType ||
      dt == ShortType || dt == ByteType
    def numeric(dt: DataType) = integral(dt) || dt == DoubleType ||
      dt == FloatType || dt.isInstanceOf[DecimalType]
    val families: Seq[(String, String, DataType => Boolean, String)] = Seq(
      ("events", "event_id", integral, "integral"),
      ("events", "user_id", integral, "integral"),
      ("events", "event_type", _ == StringType, "string"),
      ("events", "value", numeric, "numeric"),
      ("events", "props", _ == StringType, "string"),
      ("documents", "doc_id", integral, "integral"),
      ("documents", "text", _ == StringType, "string"),
      ("documents", "lang", _ == StringType, "string"),
      ("documents", "source", _ == StringType, "string"),
      ("documents", "n_chars", integral, "integral"),
      ("embeddings", "vec_id", integral, "integral"),
      ("embeddings", "label", integral, "integral"),
      ("orders", "o_orderkey", integral, "integral"),
      ("orders", "o_custkey", integral, "integral"),
      ("orders", "o_totalprice", numeric, "numeric"),
      ("lineitem", "l_orderkey", integral, "integral"),
      ("lineitem", "l_quantity", numeric, "numeric"),
      ("lineitem", "l_extendedprice", numeric, "numeric"),
      ("lineitem", "l_discount", numeric, "numeric"),
      ("customer", "c_custkey", integral, "integral"),
      ("customer", "c_acctbal", numeric, "numeric"))
    families.foreach { case (table, c, ok, family) =>
      val dt = Tables(spark, sf0001, table).schema(c).dataType
      assert(ok(dt), s"$table.$c drifted out of the $family family: $dt")
    }
  }

  test("embeddings element type is float (ANN kernels assume 4-byte lanes)") {
    val dt = Tables.embeddings(spark, sf0001).schema("embedding").dataType
    assert(dt == ArrayType(FloatType, containsNull = true)
        || dt == ArrayType(FloatType, containsNull = false),
      s"embedding element type drifted: $dt")
  }

  test("Sessions.events derives long ts_ms/ts_us consistently from the live footer") {
    val ev = graft.streaming.Sessions.events(spark, sf0001)
    assert(ev.schema("ts_ms").dataType == LongType)
    assert(ev.schema("ts_us").dataType == LongType)
    val bad = ev.filter(expr("ts_us div 1000") =!= col("ts_ms")).count()
    assert(bad == 0, "ts_us and ts_ms disagree")
    val Array(lo, hi) = ev.agg(min(col("ts_ms")), max(col("ts_ms")))
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    assert(lo > 1420070400000L && hi < 2051222400000L,
      s"ts_ms band [$lo, $hi] implausible — unit drift in the derivation")
  }

  test("epoch helpers are bit-exact and agree across all three physical branches") {
    // one instant, 2024-01-15T12:34:56.789123Z
    val us = 1705322096789123L
    val ns = us * 1000L
    val asLong = spark.range(1).select(lit(ns).as("t"))
    val asTs = spark.range(1).select(timestamp_micros(lit(us)).as("t"))
    val asNtz = spark.range(1).select(
      timestamp_micros(lit(us)).cast(TimestampNTZType).as("t"))
    Seq(asLong, asTs, asNtz).foreach { df =>
      val dt = df.schema("t").dataType
      val row = df.select(
        Tables.epochUs("t", dt).as("us"), Tables.epochMs("t", dt).as("ms"))
        .collect().head
      assert(row.getLong(0) == us, s"$dt epochUs: ${row.getLong(0)}")
      assert(row.getLong(1) == us / 1000L, s"$dt epochMs: ${row.getLong(1)}")
    }
  }

  test("epoch helpers reject an uncovered physical type loudly") {
    val e = intercept[IllegalArgumentException] {
      Tables.epochUs("x", StringType)
    }
    assert(e.getMessage.contains("unsupported physical type"))
    val e2 = intercept[IllegalArgumentException] {
      Tables.epochMs("x", DoubleType)
    }
    assert(e2.getMessage.contains("unsupported physical type"))
  }

  private def withClue[T](clue: String)(f: => T): T =
    try f catch { case e: Throwable =>
      throw new AssertionError(clue + e.getMessage, e) }
}
