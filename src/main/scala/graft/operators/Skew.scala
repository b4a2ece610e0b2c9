package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot-key workloads (SURVEY.md §7.4 /
  * 100 TB posture). At cluster scale a single hot key (empty token, a
  * boilerplate document, a bot user_id) can pin one reduce task; these
  * helpers spread it without changing semantics.
  *
  * Complementary to AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default): salting fixes
  * *aggregation* skew, which AQE does not re-plan.
  */
object Skew {

  /** Deterministic per-row salt: hash of ALL row columns mod `salts`.
    * Determinism matters for correctness, not style: a salt derived from
    * partition id / row position changes when a task is re-executed after
    * a fetch failure, double-counting or losing rows between the two
    * phases. The cost: byte-identical duplicate rows share a salt, so a
    * hot key whose rows are all identical does not spread — real fact
    * rows carry distinguishing columns.
    */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(salts))

  /** All three helpers stage a reserved `__salt` column; an input that
    * already has one would be silently overwritten (and, in
    * [[saltedBroadcastJoin]], dropped from the output) — same guard as
    * RangeJoin's `__bin` / AsOfJoin's `__side`.
    */
  private def requireNoSalt(df: DataFrame, who: String): Unit =
    require(!df.columns.contains("__salt"),
      s"Skew.$who reserves the column name __salt")

  /** Two-phase salted aggregation: count per key with the first phase
    * spread over `salts` sub-keys. Phase 1 shuffles on (key, salt) —
    * hot keys split across `salts` tasks; phase 2 combines the (at most
    * `salts`) partial rows per key. Exactly equal to a direct
    * `groupBy(key).count()`.
    */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame = {
    requireNoSalt(df, "saltedCount")
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("cnt"))
  }

  /** Generic two-phase salted sum over a long column. */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int = 16): DataFrame = {
    requireNoSalt(df, "saltedSum")
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("partial"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("total"))
  }

  /** Salted broadcast-skew join: replicate the (small) build side `salts`
    * times and salt the probe side, so a hot probe key's rows spread over
    * `salts` tasks. Semantics equal an inner equi-join on `probeKey ==
    * buildKey`. Only for build sides small enough to broadcast after
    * x`salts` replication.
    */
  def saltedBroadcastJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, salts: Int = 8): DataFrame = {
    requireNoSalt(probe, "saltedBroadcastJoin")
    requireNoSalt(build, "saltedBroadcastJoin")
    val salted = probe.withColumn("__salt", rowSalt(probe, salts).cast("int"))
    val replicated = build.crossJoin(
      broadcast(org.apache.spark.sql.SparkSession.active.range(salts).select(col("id").cast("int").as("__salt"))))
    salted.join(broadcast(replicated),
      salted(probeKey) === replicated(buildKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
