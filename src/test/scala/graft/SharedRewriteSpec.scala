package graft.queries

import graft.{MaterializedCaches, SparkSuite}
import org.apache.spark.sql.graft.Bridge

/** The table-name rewrite behind every SQL-surface query: bare relation
  * tokens are prefixed, but string literals, quoted identifiers and
  * comments are untouched, and the parse-level guard rejects a rewrite
  * that changes anything but relation references.
  */
class SharedRewriteSpec extends SparkSuite {

  test("rewriteBareWord leaves string literals, quotes and comments alone") {
    val q = "SELECT * FROM orders WHERE t = 'orders' AND u = 'x''orders' " +
      "AND v = \"orders\" -- orders in a comment\n/* orders */ JOIN orders o"
    val r = Shared.rewriteBareWord(q, "orders", "graft_orders")
    assert(r === "SELECT * FROM graft_orders WHERE t = 'orders' AND u = 'x''orders' " +
      "AND v = \"orders\" -- orders in a comment\n/* orders */ JOIN graft_orders o")
  }

  test("rewriteBareWord respects word boundaries") {
    val q = "SELECT part_stats, part.p_size, reorders FROM part"
    val r = Shared.rewriteBareWord(q, "part", "graft_part")
    assert(r === "SELECT part_stats, graft_part.p_size, reorders FROM graft_part")
  }

  test("parsedRelations sees tables and CTE references, not literals or aliases") {
    val rels = Bridge.parsedRelations(spark,
      "WITH c AS (SELECT 1 x) SELECT * FROM orders o JOIN c ON o.x = c.x WHERE t = 'lineitem'")
    assert(rels.toSet === Set("orders", "c"))
  }

  test("parsedRelations descends into subquery expressions and CTE bodies") {
    // EXISTS / IN / scalar subqueries and LATERAL hide relations inside
    // expressions; CTE bodies live outside the child traversal — all
    // must be visible or the rewrite guard is blind for those queries
    assert(Bridge.parsedRelations(spark,
      "SELECT 1 FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.k = c.k)")
      .toSet === Set("customer", "orders"))
    assert(Bridge.parsedRelations(spark,
      "SELECT 1 FROM customer c, LATERAL (SELECT k FROM orders WHERE k = c.k LIMIT 1) t")
      .toSet === Set("customer", "orders"))
    assert(Bridge.parsedRelations(spark,
      "WITH c AS (SELECT k FROM lineitem) SELECT (SELECT max(k) FROM part), * FROM c")
      .toSet === Set("lineitem", "part", "c"))
  }

  test("rewriteBareWord honors backslash-escaped quotes (Spark's default lexer)") {
    val q = "SELECT * FROM orders WHERE c = 'it\\'s orders day' AND d = orders.x"
    assert(Shared.rewriteBareWord(q, "orders", "graft_orders") ===
      "SELECT * FROM graft_orders WHERE c = 'it\\'s orders day' AND d = graft_orders.x")
  }

  test("Shared.sql runs a query containing the table name inside a literal") {
    val df = Shared.sql(spark, sf0001, Seq("orders"),
      "SELECT count(*) AS n FROM orders WHERE o_orderpriority <> 'orders'")
    assert(df.collect().head.getLong(0) > 0)
  }

  test("rewriteBareWord fuzz: only code segments rewritten (seeded, 300 rounds)") {
    // build queries from segments whose classification is known by
    // construction: code segments expect a plain word-boundary replace,
    // quoted/comment segments must come through untouched
    val rnd = new scala.util.Random(4242)
    val words = Seq("orders", "orders_x", "xorders", "part", "o1", "sum", "ORDERS")
    def codeSeg(): String =
      (0 to rnd.nextInt(3)).map(_ => words(rnd.nextInt(words.size))).mkString(" ", " ", " ")
    for (round <- 1 to 300) {
      val segs = (1 to (1 + rnd.nextInt(6))).map { _ =>
        rnd.nextInt(5) match {
          case 0 => val c = codeSeg(); (c, true)
          case 1 => ("'" + codeSeg().replace("'", "''") + "'", false)
          case 2 => ("\"" + codeSeg() + "\"", false)
          case 3 => ("/*" + codeSeg() + "*/", false)
          case 4 => ("-- " + codeSeg() + "\n", false)
        }
      }
      val q = segs.map(_._1).mkString
      val expected = segs.map { case (seg, isCode) =>
        if (isCode) seg.replaceAll("\\borders\\b", "graft_orders") else seg
      }.mkString
      assert(Shared.rewriteBareWord(q, "orders", "graft_orders") === expected,
        s"round $round input: $q")
    }
  }

  test("MaterializedCaches.invalidateAll clears every registered cache") {
    // populate at least one cache, then invalidate: a second call must be
    // safe and the registry must know all module caches
    graft.streaming.Sessions.sessionTable(spark, sf0001).count()
    assert(MaterializedCaches.registered.contains("sessions.sessionTable"))
    MaterializedCaches.invalidateAll()
    MaterializedCaches.invalidateAll() // idempotent
    // caches repopulate on demand after invalidation
    assert(graft.streaming.Sessions.sessionTable(spark, sf0001).count() > 0)
  }
}
