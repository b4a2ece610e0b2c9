package graft

import graft.plans.TopKPerGroup
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Custom heap-based top-k-per-group operator vs the window+filter
  * built-in formulation, plus plan-shape guarantees.
  */
class TopKPerGroupSpec extends SparkSuite {

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet

  test("equals window+filter row_number formulation") {
    val li = Tables.lineitem(spark, sf0001)
    val viaOp = TopKPerGroup(li, Seq("l_returnflag"),
      Seq(col("l_quantity").desc, col("l_orderkey").asc, col("l_linenumber").asc), 3)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    val viaWindow = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
    assert(asSet(viaOp) == asSet(viaWindow))
  }

  test("k larger than any group returns everything; k=1 returns group maxima") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1), ("a", 5L, 2), ("b", 3L, 3)).toDF("g", "v", "id")
    val all = TopKPerGroup(df, Seq("g"), Seq(col("v").desc, col("id").asc), 100)
    assert(all.count() == 3)
    val top1 = TopKPerGroup(df, Seq("g"), Seq(col("v").desc, col("id").asc), 1)
      .select("g", "v").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(top1 == Set(("a", 5L), ("b", 3L)))
  }

  test("physical plan contains the custom exec and no Sort operator") {
    val li = Tables.lineitem(spark, sf0001)
    val plan = TopKPerGroup(li, Seq("l_returnflag"),
      Seq(col("l_quantity").desc, col("l_orderkey").asc), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(500))
    assert(!plan.contains("Sort "), s"unexpected sort in:\n${plan.take(800)}")
  }

  test("rows within a group come out in sort order") {
    import spark.implicits._
    val df = Seq(("a", 9L, 1), ("a", 7L, 2), ("a", 8L, 3), ("a", 1L, 4)).toDF("g", "v", "id")
    val got = TopKPerGroup(df, Seq("g"), Seq(col("v").desc, col("id").asc), 3)
      .select("v").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(9L, 8L, 7L))
  }

  test("optimizer rule rewrites row_number+filter+drop to TopKPerGroupExec") {
    TopKPerGroup.ensureRule(spark)
    val li = Tables.lineitem(spark, sf0001)
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    val windowed = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    val q = windowed.select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(800))
    // neither the window operator, Spark's sort-based WindowGroupLimit
    // mitigation, nor any sort may survive the rewrite
    assert(!plan.contains("WindowGroupLimit") && !plan.contains("Window ["),
      s"window machinery survived the rewrite:\n${plan.take(800)}")
    assert(!plan.contains("Sort "), s"unexpected sort:\n${plan.take(800)}")
    // identical multiset of rows as the (unrewritten) window formulation
    val viaWindow = windowed.collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Long]("l_orderkey"),
        r.getAs[Int]("l_linenumber"))).sorted.toSeq
    val viaRule = q.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(viaRule == viaWindow)
  }

  test("decorrelated LATERAL ORDER BY+LIMIT plans onto the heap with explicit order") {
    // the lateral_topk query: Catalyst's decorrelation leaves the window's
    // order spec EMPTY and relies on a global Sort below it surviving the
    // shuffle — the rule must recover that order into TopKPerGroupExec so
    // row selection is deterministic at cluster scale
    val q = SparkEntry.queries("lateral_topk")(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup [o_custkey"), plan.take(1200))
    // the recovered heap order is the subquery's ORDER BY, made explicit
    assert(plan.contains("o_totalprice") && plan.contains("o_orderkey"),
      s"sort order not recovered into the heap:\n${plan.take(1200)}")
    assert(!plan.contains("Window ["), s"window survived:\n${plan.take(1200)}")
    // exactly one sort remains: the query's own final ORDER BY (total
    // order over the output — NOT the dropped subquery sort)
    assert("Sort \\[".r.findAllIn(plan).size == 1, plan.take(1200))
  }

  test("optimizer rule does NOT fire when rn is kept, a bound is non-literal, or no PARTITION BY") {
    TopKPerGroup.ensureRule(spark)
    val li = Tables.lineitem(spark, sf0001)
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity").desc, col("l_orderkey").asc)
    // rn in the output -> only the window operator can materialize it
    val kept = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    assert(kept.queryExecution.executedPlan.toString.contains("Window"))
    // rn compared to a column, not a literal
    val nonLit = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("l_linenumber"))
      .select(col("l_returnflag"), col("l_orderkey"))
    assert(nonLit.queryExecution.executedPlan.toString.contains("Window"))
    // global (unpartitioned) row_number
    val global = li.withColumn("rn",
        row_number().over(Window.orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))))
      .filter(col("rn") <= 3).select(col("l_orderkey"))
    assert(global.queryExecution.executedPlan.toString.contains("Window"))
    // rank(): ties all share a rank, so "rank <= k" can keep MORE than k
    // rows per group — the heap operator would silently drop them
    val ranked = li.withColumn("r", rank().over(w)).filter(col("r") <= 3)
      .select(col("l_returnflag"), col("l_orderkey"))
    val rankedPlan = ranked.queryExecution.executedPlan.toString
    assert(!rankedPlan.contains("TopKPerGroup ["),
      s"rank() must not rewrite to the fixed-k heap:\n${rankedPlan.take(800)}")
    assert(rankedPlan.contains("Window"), rankedPlan.take(800))
  }
}
