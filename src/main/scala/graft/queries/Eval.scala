package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evaluation-harness battery — pass@k estimation over per-task attempt
  * pools (the HumanEval/code-eval accounting): the unbiased estimator
  *   pass@k = 1 − C(n−c, k) / C(n, k)
  * computed per task from n attempts with c successes, plus the
  * difficulty-sliced census an eval dashboard tracks.
  *
  * The fixture has no attempts table, so — the house pattern — attempts
  * are derived deterministically: task_id = doc_id div 10 (10 attempts
  * per task), success iff (doc_id × 48271) mod 100 < 20 + 10·(task_id
  * mod 7), so difficulty classes 0..6 have planted success rates
  * 20%..80% and the class census must come out monotone (spec-pinned).
  *
  * The estimator is EXACT integer arithmetic on both engines: the
  * binomial ratio C(n−c,k)/C(n,k) is the falling-factorial quotient
  * Π(n−c−i)/Π(n−i), i < k — products fit comfortably in BIGINT at
  * n = 10 — floored into bp once; when c > n−k the numerator product
  * contains the factor 0 and the formula degenerates to pass@k = 1
  * with no special-casing. One aggregate per query; at 100 TB the
  * attempt stream reduces to (task, n, c) in a single groupBy and the
  * estimator is a map-only expression after it.
  */
object Eval {

  /** Per-task attempt reduction: task_id, difficulty, n, c. */
  private def tasks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(expr("doc_id div 10").as("task_id"),
        when((col("doc_id") * 48271L) % 100L <
          lit(20L) + lit(10L) * (expr("doc_id div 10") % 7L), 1L)
          .otherwise(0L).as("ok"))
      .groupBy(col("task_id"))
      .agg(count(lit(1)).as("n"), sum(col("ok")).as("c"))
      .withColumn("difficulty", col("task_id") % 7L)

  /** Shared attempts CTE: `tk(task_id, difficulty, n, c)`. */
  private val TasksCte =
    """at AS (SELECT doc_id // 10 AS task_id,
      |         CASE WHEN (doc_id * 48271) % 100 <
      |                20 + 10 * ((doc_id // 10) % 7)
      |              THEN 1 ELSE 0 END AS ok
      |       FROM documents),
      |tk AS (SELECT task_id, task_id % 7 AS difficulty,
      |         count(*)::BIGINT AS n, sum(ok)::BIGINT AS c
      |       FROM at GROUP BY task_id)""".stripMargin

  /** Falling-factorial pass@k expression in bp (engine-shared SQL text;
    * `div`-vs-`//` is the only dialect delta and both floor the same on
    * the nonnegative operands here).
    */
  private def passExpr(k: Int, div: String): String = {
    val num = (0 until k).map(i => s"(n - c - $i)").mkString(" * ")
    val den = (0 until k).map(i => s"(n - $i)").mkString(" * ")
    s"10000 - 10000 * ($num) $div ($den)"
  }

  /** Per-task pass@k ladder (k ∈ {1, 5, 10}) with the attempt counts. */
  def passAtK(s: SparkSession, d: String): DataFrame =
    tasks(s, d)
      .withColumn("pass1_bp", expr(passExpr(1, "div")))
      .withColumn("pass5_bp", expr(passExpr(5, "div")))
      .withColumn("pass10_bp", expr(passExpr(10, "div")))
      .select(col("task_id"), col("n"), col("c"), col("pass1_bp"),
        col("pass5_bp"), col("pass10_bp"))
      .orderBy(col("task_id"))

  /** Difficulty-class census: tasks, attempts, successes, and mean
    * pass@1/pass@5 in bp per planted difficulty class — the dashboard
    * slice; the planted 20%..80% ladder must surface as monotone class
    * means (spec-pinned).
    */
  def passkByDifficulty(s: SparkSession, d: String): DataFrame =
    tasks(s, d)
      .withColumn("pass1_bp", expr(passExpr(1, "div")))
      .withColumn("pass5_bp", expr(passExpr(5, "div")))
      .groupBy(col("difficulty"))
      .agg(count(lit(1)).as("n_tasks"), sum(col("n")).as("n_attempts"),
        sum(col("c")).as("n_success"),
        expr("sum(pass1_bp) div count(1)").as("mean_pass1_bp"),
        expr("sum(pass5_bp) div count(1)").as("mean_pass5_bp"))
      .orderBy(col("difficulty"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pass_at_k" -> passAtK,
    "passk_by_difficulty" -> passkByDifficulty,
  )

  def oracleSql: Map[String, String] = Map(
    "pass_at_k" ->
      s"""WITH $TasksCte
         |SELECT task_id, n, c,
         |  (${passExpr(1, "//")})::BIGINT AS pass1_bp,
         |  (${passExpr(5, "//")})::BIGINT AS pass5_bp,
         |  (${passExpr(10, "//")})::BIGINT AS pass10_bp
         |FROM tk ORDER BY task_id""".stripMargin,
    "passk_by_difficulty" ->
      s"""WITH $TasksCte,
         |p AS (SELECT difficulty, n, c,
         |        (${passExpr(1, "//")})::BIGINT AS p1,
         |        (${passExpr(5, "//")})::BIGINT AS p5
         |      FROM tk)
         |SELECT difficulty, count(*)::BIGINT AS n_tasks,
         |  sum(n)::BIGINT AS n_attempts, sum(c)::BIGINT AS n_success,
         |  (sum(p1) // count(*))::BIGINT AS mean_pass1_bp,
         |  (sum(p5) // count(*))::BIGINT AS mean_pass5_bp
         |FROM p GROUP BY difficulty ORDER BY difficulty""".stripMargin,
  )
}
