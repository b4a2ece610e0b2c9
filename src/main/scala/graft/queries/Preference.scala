package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Preference-data (RLHF-stage) battery — the pairwise-comparison
  * pipeline every post-training data flow runs between generation and
  * reward-model training:
  *
  *   - pairwise comparison construction ([[preferencePairs]]);
  *   - per-player and per-matchup win-rate censuses;
  *   - Bradley–Terry strength estimation (the Chatbot-Arena/reward-
  *     model scoring model) via fixed-iteration minorize-maximize;
  *   - inter-rater reliability (Cohen's kappa) and 3-rater majority
  *     vote — the label-quality gates run before any of it is trusted.
  *
  * The fixture has no comparison table, so — the [[Web]]/[[Safety]]
  * house pattern — the comparisons are constructed IN-EXPRESSION from
  * `documents` with deterministic arithmetic both engines replicate
  * bit-for-bit: comparison j is doc j vs doc j+1 (every doc is
  * compared against both neighbors — one equi-join), between players
  * (= sources); each side's score is a per-source strength
  * (400 × (suffix mod 5)) plus per-doc pseudo-noise
  * ((doc_id × 1103515245 + 12345) mod 1000), so adjacent strength
  * classes upset ~18% of the time, distant ones (gap ≥ 1200) never —
  * a realistic mixed outcome graph. Because the fixture assigns
  * source = doc_id mod 20, the matchup graph is exactly the CONNECTED
  * 20-cycle of consecutive sources — SPARSE, the regime BT exists for
  * (ratings propagate by transitivity, not direct play; an arena's
  * matchmaking graph is just as thin). [An earlier draft paired only
  * (even, odd) docs, which silently degenerates to 10 disjoint
  * 2-player components — ratings unidentified ACROSS components;
  * PreferenceSpec now pins the matchup graph connected.] On a cycle
  * only the extreme strength classes occupy structurally distinct
  * positions (class 0 loses both neighbors, class 4 beats both), so
  * the spec pins extreme-class separation plus the bit-exact solve,
  * not full class monotonicity. A wins ties (score_a >= score_b),
  * by declaration. Raters: rater 1 reads the rule; rater 2 flips every
  * 9th pair, rater 3 every 4th — so kappa, unanimity, and majority
  * overturns (both flips: pair_id mod 36) are all known in closed form
  * and spec-pinned.
  *
  * Scale notes: pairing is ONE co-partitioned equi-join on the pair
  * key (at 100 TB the comparison table arrives materialized and this
  * join disappears); every census is a single groupBy over the pair
  * stream; Bradley–Terry reduces the arbitrarily-large comparison
  * stream to the k×k win matrix FIRST (k = players, 20 here — one
  * aggregate, ≤ k² rows) and only then iterates, driver-side, on the
  * tiny matrix in exact integer micros — the scale-correct shape (the
  * matrix, not the comparisons, is the sufficient statistic for the BT
  * likelihood). 25 MM iterations with per-iteration sum normalization
  * and a 1000-micro floor, all Long arithmetic, mirrored term-for-term
  * by the unrolled-CTE DuckDB oracle. Reference analog: the grouped
  * count of `mapreduce.c`'s reduce phase — the win matrix IS a grouped
  * count; the solver is a driver fold over it.
  */
object Preference {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  /** Per-source latent strength: 400 × (numeric suffix mod 5). */
  private def strengthCol(src: Column): Column =
    substring(src, 4, 10).cast("long") % 5 * 400L

  /** Per-doc pseudo-noise in [0, 1000): a Lehmer step mod 1000. */
  private def noiseCol(id: Column): Column =
    (id * 1103515245L + 12345L) % 1000L

  private def scoreCol(id: Column, src: Column): Column =
    (strengthCol(src) + noiseCol(id)).as("score")

  /** SQL twin of the score expression over alias `t`. */
  private def scoreSql(t: String): String =
    s"(substring($t.source, 4)::BIGINT % 5) * 400 + " +
      s"($t.doc_id * 1103515245 + 12345) % 1000"

  /** The comparison frame without the presentation sort — every other
    * query's input: pair_id, the two players, both scores, rater 1's
    * verdict (`a_wins`, the score rule; A wins ties by declaration).
    */
  private def pairsOf(s: SparkSession, d: String): DataFrame = {
    val a = docs(s, d)
      .select(col("doc_id").as("pair_id"),
        col("source").as("player_a"),
        scoreCol(col("doc_id"), col("source")).as("score_a"))
    val b = docs(s, d)
      .select((col("doc_id") - 1).as("pair_id"),
        col("source").as("player_b"),
        scoreCol(col("doc_id"), col("source")).as("score_b"))
    a.join(b, "pair_id") // inner: the last doc anchors no pair
      .withColumn("a_wins", col("score_a") >= col("score_b"))
  }

  /** Shared pairs CTE (paste after WITH): `pw(pair_id, player_a,
    * player_b, score_a, score_b, a_wins)`.
    */
  private val PairsCte =
    s"""pr AS (SELECT a.doc_id AS pair_id,
       |         a.source AS player_a, b.source AS player_b,
       |         ${scoreSql("a")} AS score_a,
       |         ${scoreSql("b")} AS score_b
       |       FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
       |pw AS (SELECT pair_id, player_a, player_b, score_a, score_b,
       |         score_a >= score_b AS a_wins
       |       FROM pr)""".stripMargin

  /** The comparison table itself, presentation-sorted. */
  def preferencePairs(s: SparkSession, d: String): DataFrame =
    pairsOf(s, d).select(col("pair_id"), col("player_a"), col("player_b"),
      col("score_a"), col("score_b"), col("a_wins")).orderBy(col("pair_id"))

  /** Symmetric per-matchup edge frame (i, j, n, w_i): every unordered
    * matchup in both orientations — the BT sufficient statistic.
    */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val p = pairsOf(s, d)
    p.select(col("player_a").as("i"), col("player_b").as("j"),
        when(col("a_wins"), 1L).otherwise(0L).as("w"))
      .unionByName(p.select(col("player_b").as("i"), col("player_a").as("j"),
        when(col("a_wins"), 0L).otherwise(1L).as("w")))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("w")).as("wi"))
  }

  /** Per-matchup win matrix: games and i-over-j wins for every ordered
    * (i, j) that ever met, win rate in exact bp. One union + one
    * aggregate over the pair stream.
    */
  def winMatrix(s: SparkSession, d: String): DataFrame =
    edges(s, d)
      .withColumn("win_bp", expr("10000 * wi div n"))
      .select(col("i").as("player"), col("j").as("opponent"),
        col("n"), col("wi").as("wins"), col("win_bp"))
      .orderBy(col("player"), col("opponent"))

  /** Per-player card: games, wins, win rate in exact bp. */
  def preferenceWinrate(s: SparkSession, d: String): DataFrame =
    edges(s, d).groupBy(col("i").as("player"))
      .agg(sum(col("n")).as("games"), sum(col("wi")).as("wins"))
      .withColumn("win_bp", expr("10000 * wins div games"))
      .orderBy(col("player"))

  /** Fixed-iteration Bradley–Terry MM in integer micros. The comparison
    * stream is reduced to the k×k matrix by [[edges]] (one aggregate —
    * the only pass over the data); the ≤ k² matrix is collected and the
    * 25 MM iterations run driver-side in Long arithmetic: raw_i =
    * max(1000, W_i·10¹² div Σ_j (n_ij·10¹² div (p_i+p_j))), then
    * normalized to Σp = k·10⁶ with the same 1000 floor. Term-for-term
    * identical to the unrolled-CTE oracle (floor division, positive
    * operands, per-term flooring before the sum).
    */
  def bradleyTerry(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (players, p, wins, games, _) = solved(s, d)
    players.toSeq.map(i => (i, p(i), wins(i), games(i)))
      .toDF("player", "rating_micros", "wins", "games")
      .orderBy(col("player"))
  }

  /** The collected matrix + MM solve shared by [[bradleyTerry]] and
    * [[btCalibration]]: (sorted players, ratings, wins, games, edges).
    */
  private def solved(s: SparkSession, d: String): (Array[String],
      Map[String, Long], Map[String, Long], Map[String, Long],
      Array[(String, String, Long, Long)]) = {
    val m = edges(s, d).collect() // bounded: <= k*(k-1) rows, k = 20 sources
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val players = m.map(_._1).distinct.sorted
    val wins = m.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val games = m.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val adj = m.groupBy(_._1).view
      .mapValues(_.map(e => (e._2, e._3)).toSeq).toMap
    val K = players.length * 1000000L
    var p = players.map(_ -> 1000000L).toMap
    for (_ <- 1 to 25) {
      val raw = players.map { i =>
        val dSum = adj(i).map { case (j, n) =>
          n * 1000000000000L / (p(i) + p(j))
        }.sum
        i -> math.max(1000L, wins(i) * 1000000000000L / dSum)
      }.toMap
      val tot = raw.values.sum
      p = raw.map { case (i, v) => i -> math.max(1000L, v * K / tot) }
    }
    (players, p, wins, games, m)
  }

  /** Bradley–Terry model-fit card — the recall-of-the-ratings: per
    * ordered matchup, the model's predicted win rate
    * (10⁴·p_i/(p_i+p_j), floored bp) against the observed one, with
    * the absolute error — the house rule that every fitted artifact
    * publishes its own quality signal next to itself. Driver-side on
    * the same bounded matrix as the solve; the oracle re-runs the
    * unrolled MM chain and joins ratings back onto the matchup frame.
    * On the cycle graph the near-deterministic class-boundary matchups
    * must calibrate tightly while the noisy within-class ones carry
    * the residual (spec-pinned in aggregate).
    */
  def btCalibration(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (_, p, _, _, m) = solved(s, d)
    m.toSeq.map { case (i, j, n, wi) =>
      val predBp = 10000L * p(i) / (p(i) + p(j))
      val obsBp = 10000L * wi / n
      (i, j, n, obsBp, predBp, math.abs(predBp - obsBp))
    }.toDF("player", "opponent", "n", "obs_bp", "pred_bp", "err_bp")
      .orderBy(col("player"), col("opponent"))
  }

  /** One unrolled MM iteration: x`k` (raw update) + r`k` (normalized).
    * MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    * step referencing the previous one twice (ri, rj) would otherwise
    * expand the 25-step chain into a 2²⁵-leaf plan tree.
    */
  private def iterSql(k: Int): String =
    s"""x$k AS MATERIALIZED (SELECT g.i AS player,
       |         greatest(1000, max(wt.wins) * 1000000000000 //
       |           sum(g.n * 1000000000000 // (ri.p + rj.p))) AS p
       |       FROM g
       |       JOIN r${k - 1} ri ON ri.player = g.i
       |       JOIN r${k - 1} rj ON rj.player = g.j
       |       JOIN wt ON wt.player = g.i
       |       GROUP BY g.i),
       |r$k AS MATERIALIZED (SELECT player,
       |         greatest(1000, p * (SELECT count(*) * 1000000 FROM wt)
       |           // (SELECT sum(p) FROM x$k)) AS p
       |       FROM x$k)""".stripMargin

  /** Cohen's kappa between rater 1 (the score rule) and rater 2 (flips
    * every 9th pair): observed agreement and chance-corrected kappa in
    * exact bp — integer arithmetic, numerator nonnegative by
    * construction (agreement far above chance), so floor and truncating
    * division agree. One aggregate.
    */
  def preferenceKappa(s: SparkSession, d: String): DataFrame = {
    val r = pairsOf(s, d)
      .select(col("a_wins").as("r1"),
        (col("a_wins") =!= (col("pair_id") % 9 === 0)).as("r2"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("r1") === col("r2"), 1L).otherwise(0L)).as("n_agree"),
        sum(when(col("r1"), 1L).otherwise(0L)).as("a1"),
        sum(when(col("r2"), 1L).otherwise(0L)).as("a2"))
    r.withColumn("agree_bp", expr("10000 * n_agree div n"))
      .withColumn("kappa_bp", expr(
        """10000 * (n_agree * n - (a1 * a2 + (n - a1) * (n - a2)))
          | div (n * n - (a1 * a2 + (n - a1) * (n - a2)))""".stripMargin))
      .select(col("n").as("n_pairs"), col("n_agree"), col("agree_bp"),
        col("kappa_bp"))
  }

  /** 3-rater majority vote census: unanimity, majority-A count, and
    * overturns (majority disagrees with rater 1 — exactly the pairs
    * where raters 2 AND 3 both flip). One aggregate.
    */
  def preferenceMajority(s: SparkSession, d: String): DataFrame = {
    val p = pairsOf(s, d)
      .select(col("a_wins").as("r1"),
        (col("a_wins") =!= (col("pair_id") % 9 === 0)).as("r2"),
        (col("a_wins") =!= (col("pair_id") % 4 === 0)).as("r3"))
      .select(col("r1"), col("r2"), col("r3"),
        ((when(col("r1"), 1).otherwise(0) + when(col("r2"), 1).otherwise(0) +
          when(col("r3"), 1).otherwise(0)) >= 2).as("maj"))
    p.agg(count(lit(1)).as("n_pairs"),
      sum(when(col("r1") === col("r2") && col("r2") === col("r3"), 1L)
        .otherwise(0L)).as("n_unanimous"),
      sum(when(col("maj"), 1L).otherwise(0L)).as("n_majority_a"),
      sum(when(col("maj") =!= col("r1"), 1L).otherwise(0L)).as("n_overturned"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "preference_pairs" -> preferencePairs,
    "preference_winrate" -> preferenceWinrate,
    "win_matrix" -> winMatrix,
    "bradley_terry" -> bradleyTerry,
    "bt_calibration" -> btCalibration,
    "preference_kappa" -> preferenceKappa,
    "preference_majority" -> preferenceMajority,
  )

  def oracleSql: Map[String, String] = Map(
    "preference_pairs" ->
      s"""WITH $PairsCte
         |SELECT pair_id, player_a, player_b, score_a::BIGINT AS score_a,
         |  score_b::BIGINT AS score_b, a_wins
         |FROM pw ORDER BY pair_id""".stripMargin,
    "win_matrix" ->
      s"""WITH $PairsCte,
         |e AS (SELECT player_a AS i, player_b AS j,
         |        CASE WHEN a_wins THEN 1 ELSE 0 END AS w FROM pw
         |      UNION ALL
         |      SELECT player_b, player_a,
         |        CASE WHEN a_wins THEN 0 ELSE 1 END FROM pw),
         |g AS (SELECT i, j, count(*)::BIGINT AS n, sum(w)::BIGINT AS wi
         |      FROM e GROUP BY 1, 2)
         |SELECT i AS player, j AS opponent, n, wi AS wins,
         |  (10000 * wi // n)::BIGINT AS win_bp
         |FROM g ORDER BY player, opponent""".stripMargin,
    "preference_winrate" ->
      s"""WITH $PairsCte,
         |e AS (SELECT player_a AS i, CASE WHEN a_wins THEN 1 ELSE 0 END AS w
         |      FROM pw
         |      UNION ALL
         |      SELECT player_b, CASE WHEN a_wins THEN 0 ELSE 1 END FROM pw)
         |SELECT i AS player, count(*)::BIGINT AS games,
         |  sum(w)::BIGINT AS wins,
         |  (10000 * sum(w) // count(*))::BIGINT AS win_bp
         |FROM e GROUP BY i ORDER BY player""".stripMargin,
    "bradley_terry" ->
      s"""WITH $PairsCte,
         |e AS (SELECT player_a AS i, player_b AS j,
         |        CASE WHEN a_wins THEN 1 ELSE 0 END AS w FROM pw
         |      UNION ALL
         |      SELECT player_b, player_a,
         |        CASE WHEN a_wins THEN 0 ELSE 1 END FROM pw),
         |g AS MATERIALIZED (SELECT i, j, count(*)::BIGINT AS n,
         |        sum(w)::BIGINT AS wi
         |      FROM e GROUP BY 1, 2),
         |wt AS MATERIALIZED (SELECT i AS player, sum(wi)::BIGINT AS wins,
         |         sum(n)::BIGINT AS games
         |       FROM g GROUP BY 1),
         |r0 AS (SELECT player, 1000000::BIGINT AS p FROM wt),
         |${(1 to 25).map(iterSql).mkString(",\n")}
         |SELECT wt.player, r25.p::BIGINT AS rating_micros, wt.wins, wt.games
         |FROM wt JOIN r25 ON r25.player = wt.player
         |ORDER BY wt.player""".stripMargin,
    "bt_calibration" ->
      s"""WITH $PairsCte,
         |e AS (SELECT player_a AS i, player_b AS j,
         |        CASE WHEN a_wins THEN 1 ELSE 0 END AS w FROM pw
         |      UNION ALL
         |      SELECT player_b, player_a,
         |        CASE WHEN a_wins THEN 0 ELSE 1 END FROM pw),
         |g AS MATERIALIZED (SELECT i, j, count(*)::BIGINT AS n,
         |        sum(w)::BIGINT AS wi
         |      FROM e GROUP BY 1, 2),
         |wt AS MATERIALIZED (SELECT i AS player, sum(wi)::BIGINT AS wins,
         |         sum(n)::BIGINT AS games
         |       FROM g GROUP BY 1),
         |r0 AS (SELECT player, 1000000::BIGINT AS p FROM wt),
         |${(1 to 25).map(iterSql).mkString(",\n")}
         |SELECT g.i AS player, g.j AS opponent, g.n,
         |  (10000 * g.wi // g.n)::BIGINT AS obs_bp,
         |  (10000 * ri.p // (ri.p + rj.p))::BIGINT AS pred_bp,
         |  abs((10000 * ri.p // (ri.p + rj.p))
         |    - (10000 * g.wi // g.n))::BIGINT AS err_bp
         |FROM g JOIN r25 ri ON ri.player = g.i JOIN r25 rj ON rj.player = g.j
         |ORDER BY player, opponent""".stripMargin,
    "preference_kappa" ->
      s"""WITH $PairsCte,
         |r AS (SELECT a_wins AS r1, a_wins <> (pair_id % 9 = 0) AS r2
         |      FROM pw),
         |c AS (SELECT count(*)::BIGINT AS n,
         |        sum(CASE WHEN r1 = r2 THEN 1 ELSE 0 END)::BIGINT AS n_agree,
         |        sum(CASE WHEN r1 THEN 1 ELSE 0 END)::BIGINT AS a1,
         |        sum(CASE WHEN r2 THEN 1 ELSE 0 END)::BIGINT AS a2
         |      FROM r)
         |SELECT n AS n_pairs, n_agree,
         |  (10000 * n_agree // n)::BIGINT AS agree_bp,
         |  (10000 * (n_agree * n - (a1 * a2 + (n - a1) * (n - a2)))
         |    // (n * n - (a1 * a2 + (n - a1) * (n - a2))))::BIGINT AS kappa_bp
         |FROM c""".stripMargin,
    "preference_majority" ->
      s"""WITH $PairsCte,
         |r AS (SELECT a_wins AS r1, a_wins <> (pair_id % 9 = 0) AS r2,
         |        a_wins <> (pair_id % 4 = 0) AS r3
         |      FROM pw),
         |m AS (SELECT r1, r2, r3,
         |        (CASE WHEN r1 THEN 1 ELSE 0 END + CASE WHEN r2 THEN 1 ELSE 0 END
         |          + CASE WHEN r3 THEN 1 ELSE 0 END) >= 2 AS maj
         |      FROM r)
         |SELECT count(*)::BIGINT AS n_pairs,
         |  sum(CASE WHEN r1 = r2 AND r2 = r3 THEN 1 ELSE 0 END)::BIGINT
         |    AS n_unanimous,
         |  sum(CASE WHEN maj THEN 1 ELSE 0 END)::BIGINT AS n_majority_a,
         |  sum(CASE WHEN maj <> r1 THEN 1 ELSE 0 END)::BIGINT AS n_overturned
         |FROM m""".stripMargin,
  )
}
