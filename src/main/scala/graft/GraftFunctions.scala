package graft

import graft.functions.{CosineSimExpr, CountEqExpr, Djb2Hash, Djb2Pid, SimHash64Expr, SortedIntersectCountExpr}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-level registration of the engine's native expressions, so users can
  * reach them from `spark.sql(...)` as well as the Column API:
  *
  *   - `graft_djb2(str)`               — the reference's hash (mapreduce.c:154)
  *   - `graft_djb2_pid(str, p)`        — reference partition id (hash % p, unsigned)
  *   - `graft_simhash64(array<long>)`  — 64-bit SimHash of element hashes
  *   - `graft_cosine(a, b)`            — cosine similarity of float arrays
  *   - `graft_sorted_intersect(a, b)`  — merge-loop intersect count
  *   - `graft_sorted_intersect_elems(a, b)` — merge-loop intersect elements.
  *     NOT a drop-in `array_intersect`: both inputs must be SORTED
  *     ascending (unsorted arrays silently miss matches), and duplicates
  *     are emitted once per matched pair (set-semantics inputs assumed —
  *     no output dedup). Same preconditions for the count variant.
  *   - `graft_counteq(arr, needle)`    — term frequency (count of equal elements)
  *   - `graft_toprun(sorted_arr)`      — longest run of a sorted array (mode/argmax)
  *   - `graft_morton(x, y)`            — Z-order bit interleave (ZOrder.morton2)
  *
  * Two registration paths:
  *   - [[GraftExtensions]] for `--conf spark.sql.extensions=graft.GraftExtensions`
  *     (session build time — the standard extension mechanism);
  *   - [[GraftFunctions.register]] for an already-running session.
  */
object GraftFunctions {

  // exact-arity guard: `es.head`/`es(1)` alone would silently DISCARD
  // extra arguments (graft_toprun(arr, oops) computing toprun(arr) looks
  // plausible and is wrong) and crash confusingly on too few
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != n) throw new IllegalArgumentException(
        s"$name takes exactly $n argument(s), got ${es.length}")
      build(es)
    }

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_djb2" -> arity("graft_djb2", 1)(es => Djb2Hash(es.head)),
    "graft_djb2_pid" -> arity("graft_djb2_pid", 2)(es => Djb2Pid(es.head, es(1) match {
      // accept any integral literal width; reject non-foldable args with a
      // clear message instead of an eval() crash on an unevaluable column
      case e if e.foldable => e.eval() match {
        case i: java.lang.Integer => i.intValue()
        case l: java.lang.Long => math.toIntExact(l.longValue())
        case s: java.lang.Short => s.intValue()
        case b: java.lang.Byte => b.intValue()
        case other => throw new IllegalArgumentException(
          s"graft_djb2_pid: numPartitions must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "graft_djb2_pid: numPartitions must be a literal (foldable), not a column")
    })),
    "graft_simhash64" -> arity("graft_simhash64", 1)(es => SimHash64Expr(es.head)),
    "graft_cosine" -> arity("graft_cosine", 2)(es => CosineSimExpr(es.head, es(1))),
    "graft_sorted_intersect" ->
      arity("graft_sorted_intersect", 2)(es => SortedIntersectCountExpr(es.head, es(1))),
    "graft_sorted_intersect_elems" ->
      arity("graft_sorted_intersect_elems", 2)(
        es => graft.functions.SortedIntersectExpr(es.head, es(1))),
    "graft_counteq" -> arity("graft_counteq", 2)(es => CountEqExpr(es.head, es(1))),
    "graft_toprun" -> arity("graft_toprun", 1)(es => graft.functions.TopRunExpr(es.head)),
    "graft_morton" ->
      arity("graft_morton", 2)(es => graft.functions.ZOrder.morton2Expr(es.head, es(1))),
  )

  private def infoOf(name: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usages.getOrElse(name, name), "")

  /** Register all graft functions on a live session — with their
    * [[ExpressionInfo]], so `DESCRIBE FUNCTION graft_*` states the
    * contract on this path too, not only via [[GraftExtensions]].
    */
  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), infoOf(name), builder)
    }

  /** `DESCRIBE FUNCTION` text per registered name — the SQL-user-facing
    * contract line, including the preconditions the Column-API scaladoc
    * states (the sorted-intersect pair would otherwise read as a
    * drop-in array_intersect, which it is not).
    */
  private val usages: Map[String, String] = Map(
    "graft_djb2" -> "graft_djb2(str) - the reference engine's djb2 hash (unsigned 32-bit).",
    "graft_djb2_pid" -> ("graft_djb2_pid(str, p) - reference partition id: " +
      "djb2(str) % p with p an integer literal."),
    "graft_simhash64" -> "graft_simhash64(array<bigint>) - 64-bit SimHash of element hashes.",
    "graft_cosine" -> "graft_cosine(a, b) - cosine similarity of two float arrays.",
    "graft_sorted_intersect" -> ("graft_sorted_intersect(a, b) - merge-loop intersect COUNT. " +
      "Preconditions: both arrays SORTED ascending with set semantics " +
      "(unsorted input silently miscounts; duplicates count per matched pair)."),
    "graft_sorted_intersect_elems" -> ("graft_sorted_intersect_elems(a, b) - merge-loop " +
      "intersect ELEMENTS. NOT a drop-in array_intersect: both arrays must be SORTED " +
      "ascending with set semantics; duplicates are emitted once per matched pair, no dedup."),
    "graft_counteq" -> "graft_counteq(arr, needle) - count of elements equal to needle (term frequency).",
    "graft_toprun" -> ("graft_toprun(sorted_arr) - value and length of the longest run of a " +
      "SORTED array (the grouped mode/argmax)."),
    "graft_morton" -> "graft_morton(x, y) - Z-order bit interleave of two non-negative ints.",
  )

  private[graft] def inject(e: SparkSessionExtensions): Unit =
    fns.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name), infoOf(name), builder))
    }
}

/** `spark.sql.extensions` entry point: native functions, the TopKPerGroup
  * planner strategy, and the window-top-k rewrite rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.inject(e)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    e.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
  }
}
