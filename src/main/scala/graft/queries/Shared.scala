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

  /** DuckDB CTE block (paste after `WITH `): per-doc learned-BPE subword
    * counts as `bpe_n(doc_id, source, lang, n_tok)`, recomputed from raw
    * text — the same pre-tokenizer regex as the Spark side — joined
    * against the `bpe_word_tokens` dump (`{OUT}` is substituted with the
    * absolute output dir by Verify at dump time; the word table's own
    * counts are pinned exactly by BpeSpec). Docs with no pieces count 0.
    */
  val BpeDocTokCte =
    """bpe_u AS (SELECT doc_id, unnest(regexp_extract_all(text,
      |    '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\r]')) AS tok FROM documents),
      |bpe_w AS (SELECT word, n_tokens
      |          FROM read_parquet('{OUT}/bpe_word_tokens/*.parquet')),
      |bpe_c AS (SELECT u.doc_id,
      |    sum(CASE WHEN regexp_full_match(u.tok, '[A-Za-z]+')
      |        THEN w.n_tokens ELSE 1 END)::BIGINT AS n_tok
      |    FROM bpe_u u LEFT JOIN bpe_w w ON u.tok = w.word GROUP BY u.doc_id),
      |bpe_n AS (SELECT d.doc_id, d.source, d.lang,
      |    coalesce(c.n_tok, 0)::BIGINT AS n_tok
      |    FROM documents d LEFT JOIN bpe_c c ON d.doc_id = c.doc_id)""".stripMargin

  /** Driver-sortable-output serialization, single-sourced: an array
    * column flattened to a ','-joined string (the harness row-sorts in
    * pandas, where array cells are unhashable — see CoreQueriesSpec's
    * schema guard). The cast is a no-op on string arrays and pins the
    * integer formatting on numeric ones; empty arrays yield ''. DuckDB
    * twin: `coalesce(array_to_string(..., ','), '')` (DuckDB returns
    * NULL for empty lists where this yields ''). A NULL array input
    * also coalesces to '' on BOTH sides — without the coalesce here, a
    * nullable array column (e.g. from a left join) would drift from the
    * documented twin.
    */
  def csv(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{array_join, coalesce, lit, transform}
    coalesce(array_join(transform(c, _.cast("string")), ","), lit(""))
  }

  /** Register the named testdata tables as uniquely-prefixed temp views
    * (`graft_orders`, not `orders` — bare names would silently clobber a
    * user view on the shared session) and substitute the prefix into the
    * query text before running it.
    */
  def sql(s: SparkSession, d: String, tables: Seq[String], q: String): DataFrame = {
    val rewritten = tables.foldLeft(q) { (acc, t) =>
      Tables(s, d, t).createOrReplaceTempView(s"graft_$t")
      rewriteBareWord(acc, t, s"graft_$t")
    }
    // Loud guard: the textual rewrite must have changed exactly the
    // relation references (table + CTE names), nothing else. A literal
    // like event_type = 'orders' or a stray token would shift this set.
    val orig = org.apache.spark.sql.graft.Bridge.parsedRelations(s, q)
    val expect = orig.map(r => if (tables.contains(r)) s"graft_$r" else r)
    val got = org.apache.spark.sql.graft.Bridge.parsedRelations(s, rewritten)
    require(got == expect,
      s"table-name rewrite corrupted the query: relations $got != expected $expect\n$rewritten")
    s.sql(rewritten)
  }

  /** Replace word-boundary occurrences of `from` with `to`, but ONLY in
    * plain SQL text — occurrences inside single-quoted string literals,
    * double-quoted / backtick-quoted identifiers, `--` line comments and
    * bracketed comments are left untouched (a query filtering on
    * `event_type = 'orders'` must not become `'graft_orders'`).
    */
  private[queries] def rewriteBareWord(q: String, from: String, to: String): String = {
    val sb = new StringBuilder(q.length + 64)
    val n = q.length
    var i = 0
    def wordChar(c: Char) = c == '_' || Character.isLetterOrDigit(c)
    while (i < n) {
      val c = q.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        // quoted region: copy verbatim. Handles BOTH escape styles that
        // Spark's default lexer accepts — doubled quotes ('') and
        // backslash escapes (\' — spark.sql.parser.escapedStringLiterals
        // is false by default), so a literal like 'it\'s orders' cannot
        // be terminated early and rewritten mid-literal
        val quote = c
        sb.append(c); i += 1
        var done = false
        while (i < n && !done) {
          sb.append(q.charAt(i))
          if (q.charAt(i) == '\\' && i + 1 < n) { // backslash escape: copy next blindly
            sb.append(q.charAt(i + 1)); i += 1
          } else if (q.charAt(i) == quote) {
            if (i + 1 < n && q.charAt(i + 1) == quote) { sb.append(quote); i += 1 }
            else done = true
          }
          i += 1
        }
      } else if (c == '-' && i + 1 < n && q.charAt(i + 1) == '-') { // line comment
        while (i < n && q.charAt(i) != '\n') { sb.append(q.charAt(i)); i += 1 }
      } else if (c == '/' && i + 1 < n && q.charAt(i + 1) == '*') { // block comment
        sb.append("/*"); i += 2
        while (i < n && !(q.charAt(i) == '*' && i + 1 < n && q.charAt(i + 1) == '/')) {
          sb.append(q.charAt(i)); i += 1
        }
        if (i < n) { sb.append("*/"); i += 2 }
      } else if (q.startsWith(from, i) &&
          (i == 0 || !wordChar(q.charAt(i - 1))) &&
          (i + from.length >= n || !wordChar(q.charAt(i + from.length)))) {
        sb.append(to); i += from.length
      } else {
        sb.append(c); i += 1
      }
    }
    sb.toString
  }
}
