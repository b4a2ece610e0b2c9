package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the engine, built from `org.apache.spark.sql.functions`
  * (codegen'd builtins / higher-order functions — no Scala UDFs in the hot
  * path, so whole-stage codegen spans stay wide).
  *
  * Tokenization semantics mirror the reference mapper
  * (`/root/reference/distwc.c:14-18`): split on the single-character
  * delimiters `[ \t\n\r]` and KEEP empty tokens — `strsep` yields an empty
  * token for every run of consecutive delimiters (SURVEY.md §1.3).
  */
object TextFns {

  /** The reference's delimiter class, as a Java/RE2-compatible regex. */
  val DelimRe = "[ \t\n\r]"

  /** `strsep`-equivalent tokenization: preserves empty tokens (limit -1). */
  def tokens(text: Column): Column = split(text, DelimRe, -1)

  /** Tokens exploded to one row each (the MR_Emit stream, distwc.c:16-18). */
  def explodedTokens(text: Column): Column = explode(tokens(text))

  /** "BPE-ish" subword tokenization: letter runs, digit runs, or single
    * other non-space chars. Same regex works in Java regex and DuckDB RE2.
    */
  val BpeRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]"
  def bpeTokens(text: Column): Column = regexp_extract_all(text, lit(BpeRe), lit(0))

  // --- language-ID heuristic ------------------------------------------------
  // Marker-word hit counting per language; argmax with deterministic
  // alphabetical tie-break, 'und' when no marker hits. Kept simple enough to
  // be expressible identically in DuckDB SQL (see Pipeline.oracle).
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "and", "of", "is", "not"),
    "es" -> Seq("el", "la", "y", "de", "que", "no"),
    "fr" -> Seq("le", "la", "et", "les", "des", "ne"),
  )

  /** Number of tokens of `toks` that appear in `markers`. */
  private def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => m: Any): _*)))

  /** Predicted language code from marker-word hits over the token array. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val hits = LangMarkers.map { case (lang, ms) => lang -> markerHits(toks, ms) }
    val best = greatest(hits.map(_._2): _*)
    // first (alphabetical) language reaching the max; 'und' when max == 0
    hits.foldRight(lit("und")) { case ((lang, h), elseCol) =>
      when(best > 0 && h === best, lit(lang)).otherwise(elseCol)
    }
  }

  // --- quality scoring ------------------------------------------------------

  /** Sum of token lengths via a sequential left fold (deterministic; the
    * DuckDB oracle uses the same fold via list_reduce).
    */
  def sumTokenLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t))

  /** Heuristic document quality in [0,1]:
    * 0.5 * min(1, n_tokens/100) + 0.5 * stopword_ratio, rounded to 6dp.
    * All inputs are exact integers, so the double math is bit-deterministic
    * across engines.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val stop = markerHits(toks, LangMarkers.toMap.apply("en")).cast("double")
    round(lit(0.5) * least(lit(1.0), n / lit(100.0)) + lit(0.5) * (stop / n), 6)
  }

  // --- document fingerprinting ---------------------------------------------
  // Rolling-hash (winnowing-style) fingerprint over token 3-gram hashes.
  // Arithmetic is kept mod 2^31 so the identical formula is expressible in
  // DuckDB SQL without BIGINT overflow (DuckDB raises on int64 overflow).
  private val M = 2147483648L // 2^31

  /** Per-token polynomial hash: fold over char codes, mod 2^31. */
  def tokenHash31(t: Column): Column =
    aggregate(split(t, ""), lit(5381L), (acc, ch) => (acc * 33 + ascii(ch)) % M)

  /** Winnowing-style fingerprint for every row of `df`: min over all
    * consecutive token-3-gram combined hashes of `textCol`, over NON-EMPTY
    * tokens (empty tokens have no bytes to hash and DuckDB's `ord('')`
    * errors — both sides filter identically). Rows with < 3 tokens are
    * dropped.
    *
    * DataFrame-shaped (staged projections) rather than a single Column on
    * purpose: `element_at` on an expression-built array re-evaluates the
    * child per access inside HOFs (no CSE), turning the gram loop into
    * O(n_tokens^2) per row — staging each array as a concrete column is
    * ~50x faster at sf0.1. This is THE fingerprint definition; the
    * doc_fingerprint query and its spec both go through it.
    */
  def fingerprintDf(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol),
        filter(tokens(col(textCol)), t => t =!= "").as("__ts"))
      .filter(size(col("__ts")) >= 3)
      .select(col(idCol),
        transform(col("__ts"), t => tokenHash31(t)).as("__hs"))
      .select(col(idCol),
        array_min(transform(sequence(lit(1), size(col("__hs")) - lit(2)), i =>
          (((element_at(col("__hs"), i) * 31 + element_at(col("__hs"), i + 1)) % M) * 31
            + element_at(col("__hs"), i + 2)) % M)).as("fp"))
}
