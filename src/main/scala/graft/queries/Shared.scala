package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parity-critical fragments shared by the query modules — single-sourced
  * because the oracle gate depends on them staying byte-identical across
  * files (a drifted copy surfaces only as a confusing hash mismatch).
  */
private[queries] object Shared {

  /** DuckDB fragment: the reference tokenization minus empties. Must stay
    * in lockstep with `TextFns.tokens`' delimiter class `[ \t\n\r]`.
    */
  val ToksNE =
    "list_filter(string_split_regex(text, '[ \t\n\r]'), t -> t <> '')"

  /** Register the named testdata tables as uniquely-prefixed temp views
    * (`graft_orders`, not `orders` — bare names would silently clobber a
    * user view on the shared session) and substitute the prefix into the
    * query text before running it.
    */
  def sql(s: SparkSession, d: String, tables: Seq[String], q: String): DataFrame = {
    val rewritten = tables.foldLeft(q) { (acc, t) =>
      Tables(s, d, t).createOrReplaceTempView(s"graft_$t")
      acc.replaceAll(s"\\b$t\\b", s"graft_$t")
    }
    s.sql(rewritten)
  }
}
