package graft.queries

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT/dialogue data prep — the stage between curation and the
  * training feed for instruction data: assemble raw records into
  * conversations, census the turn structure, truncate to a context
  * budget, pack into training text, and compute the loss mask.
  *
  * The fixture has no conversation table, so — the house pattern — the
  * structure is derived deterministically: conv_id = doc_id div 5,
  * turn_idx = doc_id mod 5, roles alternate user/assistant on
  * turn_idx parity. A turn is DROPPED when the [[Safety]] blocklist
  * plant flags its doc (closed form: doc_id ≡ 0 mod 7 or mod 11 —
  * DialogueSpec pins this set equal to `badwords_filter`'s own drop
  * set, so the two formulations cannot drift silently), which is what
  * makes the structure non-trivial: dropped turns break role
  * alternation and shift the context window.
  *
  * Scale notes: every query is a map + a window or aggregate
  * PARTITIONED BY conv_id — the natural parallel unit of dialogue
  * data; nothing here sorts globally except the presentation
  * `orderBy`, and nothing shuffles more than once. Truncation is the
  * production rule (keep the longest SUFFIX of turns fitting the
  * budget — recent context wins) computed as a reverse running token
  * sum inside the conversation window. Reference analog: per-key
  * grouped iteration, `mapreduce.c`'s reduce cursor — a conversation
  * is a key's value stream with an order.
  */
object Dialogue {

  /** Context budget in reference tokens for truncation/packing. Fixture
    * turns run 10–99 tokens (median 56), so 150 bites on most 5-turn
    * conversations while never dropping every turn of a surviving
    * conversation.
    */
  private val Budget = 150L

  /** Surviving turns with structure columns: conv_id, turn_idx, role,
    * n_tok. The drop rule is the Safety plant's closed form.
    */
  private def turns(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(!(col("doc_id") % 7 === 0 || col("doc_id") % 11 === 0))
      .select(expr("doc_id div 5").as("conv_id"),
        (col("doc_id") % 5).as("turn_idx"),
        when(col("doc_id") % 5 % 2 === 0, lit("user"))
          .otherwise(lit("assistant")).as("role"),
        size(Dedup.tokensNE(col("text"))).cast("long").as("n_tok"),
        col("text"))

  /** Shared turns CTE: `tu(conv_id, turn_idx, role, n_tok, text)`. */
  private val TurnsCte =
    s"""tu AS (SELECT doc_id // 5 AS conv_id, doc_id % 5 AS turn_idx,
       |         CASE WHEN doc_id % 5 % 2 = 0 THEN 'user'
       |              ELSE 'assistant' END AS role,
       |         len(${Shared.ToksNE})::BIGINT AS n_tok, text
       |       FROM documents
       |       WHERE NOT (doc_id % 7 = 0 OR doc_id % 11 = 0))""".stripMargin

  /** Per-conversation structure census: surviving turns by role, total
    * tokens, and whether role alternation survived the safety drops
    * (no two consecutive surviving turns share a role). One
    * conv-partitioned window + one aggregate.
    */
  def turnCensus(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    turns(s, d)
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"),
        sum(when(col("role") === "assistant", 1L).otherwise(0L)).as("n_asst"),
        sum(col("n_tok")).as("n_tok"),
        (sum(when(col("prev_role") === col("role"), 1L).otherwise(0L)) === 0L)
          .as("alternation_ok"))
      .orderBy(col("conv_id"))
  }

  /** Turns frame with the suffix-budget keep flag: a turn is kept iff
    * the token sum from it to the END of the conversation fits the
    * budget (recent-context-wins truncation).
    */
  private def truncated(s: SparkSession, d: String): DataFrame = {
    val wRev = Window.partitionBy(col("conv_id"))
      .orderBy(col("turn_idx").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns(s, d)
      .withColumn("sfx_tok", sum(col("n_tok")).over(wRev))
      .withColumn("kept", col("sfx_tok") <= Budget)
  }

  /** SQL twin of [[truncated]] (paste after [[TurnsCte]]): `tr` adds
    * sfx_tok and kept.
    */
  private val TruncCte =
    s"""tr AS (SELECT conv_id, turn_idx, role, n_tok, text,
       |         sum(n_tok) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
       |           ROWS UNBOUNDED PRECEDING) AS sfx_tok,
       |         sum(n_tok) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
       |           ROWS UNBOUNDED PRECEDING) <= $Budget AS kept
       |       FROM tu)""".stripMargin

  /** Context truncation card: per conversation, surviving turns vs
    * turns kept under the budget, tokens kept, and how many surviving
    * turns the budget evicted.
    */
  def contextTruncate(s: SparkSession, d: String): DataFrame =
    truncated(s, d).groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("tok_kept"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_evicted"))
      .orderBy(col("conv_id"))

  /** Packed training text: kept turns tagged `<role> text`, joined in
    * turn order — the string the trainer actually consumes. Built with
    * an in-conversation sort of the collected kept turns (bounded: ≤ 5
    * turns per conversation by construction).
    */
  def conversationPack(s: SparkSession, d: String): DataFrame =
    truncated(s, d).filter(col("kept"))
      .select(col("conv_id"), col("turn_idx"),
        concat(lit("<"), col("role"), lit("> "), col("text")).as("tagged"),
        col("n_tok"))
      .groupBy(col("conv_id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("turn_idx"), col("tagged")))),
          x => x("tagged")), " ").as("packed"),
        sum(col("n_tok")).as("n_tok"),
        count(lit(1)).as("n_turns"))
      .withColumn("packed_len", length(col("packed")).cast("long"))
      .select(col("conv_id"), col("packed"), col("packed_len"), col("n_tok"),
        col("n_turns"))
      .orderBy(col("conv_id"))

  /** SFT loss-mask card: per conversation, trainable tokens (assistant
    * turns in the kept window) vs masked (user) tokens, trainable share
    * in exact bp. Conversations whose kept window has no turns are
    * absent (nothing to train on).
    */
  def sftLossMask(s: SparkSession, d: String): DataFrame =
    truncated(s, d).filter(col("kept"))
      .groupBy(col("conv_id"))
      .agg(sum(when(col("role") === "assistant", col("n_tok")).otherwise(0L))
          .as("tok_train"),
        sum(when(col("role") === "user", col("n_tok")).otherwise(0L))
          .as("tok_masked"))
      .withColumn("train_bp",
        expr("10000 * tok_train div (tok_train + tok_masked)"))
      .orderBy(col("conv_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "turn_census" -> turnCensus,
    "context_truncate" -> contextTruncate,
    "conversation_pack" -> conversationPack,
    "sft_loss_mask" -> sftLossMask,
  )

  def oracleSql: Map[String, String] = Map(
    "turn_census" ->
      s"""WITH $TurnsCte,
         |l AS (SELECT conv_id, role, n_tok,
         |        lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
         |          AS prev_role
         |      FROM tu)
         |SELECT conv_id, count(*)::BIGINT AS n_turns,
         |  sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT AS n_user,
         |  sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT
         |    AS n_asst,
         |  sum(n_tok)::BIGINT AS n_tok,
         |  (sum(CASE WHEN prev_role = role THEN 1 ELSE 0 END) = 0)
         |    AS alternation_ok
         |FROM l GROUP BY conv_id ORDER BY conv_id""".stripMargin,
    "context_truncate" ->
      s"""WITH $TurnsCte,
         |$TruncCte
         |SELECT conv_id, count(*)::BIGINT AS n_turns,
         |  sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
         |  sum(CASE WHEN kept THEN n_tok ELSE 0 END)::BIGINT AS tok_kept,
         |  sum(CASE WHEN kept THEN 0 ELSE 1 END)::BIGINT AS n_evicted
         |FROM tr GROUP BY conv_id ORDER BY conv_id""".stripMargin,
    "conversation_pack" ->
      s"""WITH $TurnsCte,
         |$TruncCte
         |SELECT conv_id,
         |  string_agg('<' || role || '> ' || text, ' ' ORDER BY turn_idx)
         |    AS packed,
         |  length(string_agg('<' || role || '> ' || text, ' '
         |    ORDER BY turn_idx))::BIGINT AS packed_len,
         |  sum(n_tok)::BIGINT AS n_tok, count(*)::BIGINT AS n_turns
         |FROM tr WHERE kept GROUP BY conv_id ORDER BY conv_id""".stripMargin,
    "sft_loss_mask" ->
      s"""WITH $TurnsCte,
         |$TruncCte
         |SELECT conv_id,
         |  sum(CASE WHEN role = 'assistant' THEN n_tok ELSE 0 END)::BIGINT
         |    AS tok_train,
         |  sum(CASE WHEN role = 'user' THEN n_tok ELSE 0 END)::BIGINT
         |    AS tok_masked,
         |  (10000 * sum(CASE WHEN role = 'assistant' THEN n_tok ELSE 0 END)
         |    // sum(n_tok))::BIGINT AS train_bp
         |FROM tr WHERE kept GROUP BY conv_id ORDER BY conv_id""".stripMargin,
  )
}
