package graft.queries

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-safety and structure filters — the two pre-training stages
  * the existing battery does not cover, plus the n-gram rung ladder
  * that completes the Gopher repetition signals:
  *
  *   - term-blocklist filtering (C4's "bad words" stage: a document
  *     containing any listed term is dropped wholesale);
  *   - code-vs-prose detection (the StarCoder/Pile routing stage: code
  *     files go to a code corpus or get dropped from a prose one);
  *   - top n-gram dominance for n ∈ {2,3,4} (Gopher's duplicated
  *     n-gram fraction family; `repetition_ngram` covers n=2 only).
  *
  * The fixture corpus is clean prose from a small vocabulary, so — the
  * [[Web]] house pattern — both families construct their positives
  * IN-EXPRESSION from the parquet columns (deterministic plants keyed
  * on doc_id): Spark and DuckDB read the SAME bytes, build the SAME
  * augmented text, and must land on identical verdicts, construction
  * included. SafetySpec additionally pins the SEMANTIC contract: the
  * flagged sets are exactly the planted sets — known positives, zero
  * false positives.
  *
  * Scale notes: both filters are map-only expression chains (the term
  * list is a literal here and a broadcast map at production size —
  * C4's list is ~400 terms/language, far below any broadcast
  * threshold), so at 100 TB they ride the ingest scan like the
  * extraction chain they follow. The ladder is three map-only passes
  * (one in-row sort + topRun scan per n — no (doc, gram) explode, no
  * shuffle; same plan shape as `repetition_ngram`). Reference analog:
  * the token stream of `distwc.c:16-18` — these are per-token verdicts
  * folded back to per-document ones.
  */
object Safety {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  // --- term-blocklist (bad-words) filtering ------------------------------

  /** The fixture slice of a production blocklist. `unsafeword2` is
    * listed but never planted — the listed-but-absent term that keeps
    * the zero-false-positive claim honest.
    */
  private val Badwords = Seq("unsafeword0", "unsafeword1", "unsafeword2")

  /** Deterministic plants: one listed term for every 7th doc, a twice-
    * repeated second term for every 11th (so hit COUNTS vary, not just
    * the flag) — docs hit by both mods carry all three occurrences.
    */
  private def badAugCol: Column = concat(col("text"),
    when(col("doc_id") % 7 === 0, lit(" unsafeword0")).otherwise(lit("")),
    when(col("doc_id") % 11 === 0, lit(" unsafeword1 unsafeword1"))
      .otherwise(lit("")))

  /** DuckDB twin of [[badAugCol]] (aliased AS text so the shared
    * tokenizer fragment resolves against it).
    */
  private val BadAugSql =
    """text || CASE WHEN doc_id % 7 = 0 THEN ' unsafeword0' ELSE '' END ||
      |  CASE WHEN doc_id % 11 = 0
      |       THEN ' unsafeword1 unsafeword1' ELSE '' END""".stripMargin

  /** Per-document blocklist verdict frame without the presentation
    * sort — [[curationFunnel]] joins against it (the qualityFlags
    * convention).
    */
  private def badPerDoc(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"), badAugCol.as("aug"))
      .select(col("doc_id"),
        size(filter(Dedup.tokensNE(col("aug")),
          t => t.isin(Badwords: _*))).cast("long").as("n_hits"))
      .withColumn("kept", col("n_hits") === 0L)

  /** Per-document blocklist verdict: listed-term occurrence count and
    * the C4 keep rule (any hit drops the doc). Token-exact — `isin`
    * over the reference tokenization, not substring containment, so
    * "classic" can never match a listed "class"-like term. Map-only.
    */
  def badwordsFilter(s: SparkSession, d: String): DataFrame =
    badPerDoc(s, d).orderBy(col("doc_id"))

  /** Per-source blocklist census: docs flagged, flag rate in exact bp,
    * and total occurrences — the card a pipeline tracks per crawl
    * source to spot a source gone bad. One aggregate after the
    * map-only verdict.
    */
  def badwordsCensus(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("source"), badAugCol.as("aug"))
      .select(col("source"),
        size(filter(Dedup.tokensNE(col("aug")),
          t => t.isin(Badwords: _*))).cast("long").as("n_hits"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hits") > 0, 1L).otherwise(0L)).as("n_flagged"),
        sum(col("n_hits")).as("n_hits_total"))
      .withColumn("flag_bp", expr("10000 * n_flagged div n_docs"))
      .select(col("source"), col("n_docs"), col("n_flagged"),
        col("n_hits_total"), col("flag_bp"))
      .orderBy(col("source"))

  // --- code-vs-prose detection --------------------------------------------

  /** Code keywords counted as whole tokens (shared with the oracle). */
  private val CodeKeywords =
    Seq("function", "return", "var", "def", "class", "import")

  /** Symbol characters whose density separates code from prose. */
  private val SymRe = "[{}();=+]"

  /** Deterministic plants: every 5th doc IS a code file (replaced, not
    * appended — a corpus is a mix of whole files, and replacement keeps
    * the symbol-density signal independent of the original doc's
    * length).
    */
  private def codeAugCol: Column =
    when(col("doc_id") % 5 === 0,
      concat(lit("function f_"), col("doc_id").cast("string"),
        lit("(x) { var y = x + "), (col("doc_id") % 97).cast("string"),
        lit("; return y; } // gen "), col("doc_id").cast("string")))
      .otherwise(col("text"))

  /** DuckDB twin of [[codeAugCol]]. The `||` operators sit at line ENDS:
    * this fragment is re-interpolated into outer `.stripMargin` oracle
    * strings, and a continuation line starting with `||` would lose its
    * first pipe to the outer margin strip (→ bitwise `|` on VARCHAR).
    */
  private val CodeAugSql =
    """CASE WHEN doc_id % 5 = 0
      |     THEN 'function f_' || doc_id::VARCHAR || '(x) { var y = x + ' ||
      |       (doc_id % 97)::VARCHAR || '; return y; } // gen ' ||
      |       doc_id::VARCHAR
      |     ELSE text END""".stripMargin

  /** Per-document detector frame without the presentation sort — the
    * funnel's join input.
    */
  private def codePerDoc(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"), codeAugCol.as("aug"))
      .select(col("doc_id"),
        length(col("aug")).cast("long").as("n_chars"),
        regexp_count(col("aug"), lit(SymRe)).cast("long").as("n_sym"),
        size(filter(Dedup.tokensNE(col("aug")),
          t => t.isin(CodeKeywords: _*))).cast("long").as("kw_hits"))
      .withColumn("sym_bp", expr("10000 * n_sym div n_chars"))
      .withColumn("is_code", col("kw_hits") >= 2L && col("sym_bp") >= 100L)
      .select(col("doc_id"), col("n_chars"), col("n_sym"), col("sym_bp"),
        col("kw_hits"), col("is_code"))

  /** Per-document code detector: symbol density (integer bp of chars)
    * and whole-token keyword hits; code iff BOTH clear their threshold
    * (>= 2 keywords AND >= 1% symbol chars — either alone misfires:
    * prose ABOUT code trips keywords, config/markup trips symbols).
    * Map-only expression chain.
    */
  def codeDetect(s: SparkSession, d: String): DataFrame =
    codePerDoc(s, d).orderBy(col("doc_id"))

  /** Per-source code-rate card: the routing census (how much of each
    * source is code, in exact bp). One aggregate after the map-only
    * detector.
    */
  def codeCensus(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("source"), codeAugCol.as("aug"))
      .select(col("source"),
        regexp_count(col("aug"), lit(SymRe)).cast("long").as("n_sym"),
        length(col("aug")).cast("long").as("n_chars"),
        size(filter(Dedup.tokensNE(col("aug")),
          t => t.isin(CodeKeywords: _*))).cast("long").as("kw_hits"))
      .withColumn("is_code",
        col("kw_hits") >= 2L && expr("10000 * n_sym div n_chars") >= 100L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_code"), 1L).otherwise(0L)).as("n_code"),
        sum(col("n_sym")).as("n_sym_total"))
      .withColumn("code_bp", expr("10000 * n_code div n_docs"))
      .select(col("source"), col("n_docs"), col("n_code"),
        col("n_sym_total"), col("code_bp"))
      .orderBy(col("source"))

  // --- top n-gram dominance ladder ----------------------------------------

  /** Gopher's duplicated n-gram fraction at n ∈ {2,3,4}: per document,
    * the most frequent n-gram, its count, and the share of n-gram slots
    * it occupies in exact bp. Each rung is MAP-ONLY — grams are built
    * in-row from the token list, sorted in-row, and the argmax comes
    * from the codegen'd [[graft.functions.SketchExprs.topRun]] run-
    * length scan (the `repetition_ngram` plan shape, generalized) — so
    * the whole ladder is three expression passes and never shuffles a
    * gram. Tie-break contract: the smallest SPACE-JOINED gram wins on
    * both engines (binary string order), exact for arbitrary token
    * bytes.
    */
  def repetitionNgramLadder(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
      .select(col("doc_id"), Dedup.tokensNE(col("text")).as("ts"))
      .select(col("doc_id"), col("ts"), size(col("ts")).as("l"))
    def rung(n: Int): DataFrame = {
      val grams = transform(sequence(lit(1), col("l") - lit(n - 1)),
        i => concat_ws(" ",
          (0 until n).map(k => element_at(col("ts"), i + lit(k))): _*))
      base.filter(col("l") >= n)
        .withColumn("tr", graft.functions.SketchExprs.topRun(sort_array(grams)))
        .select(col("doc_id"), lit(n.toLong).as("n"),
          (col("l") - lit(n - 1)).cast("long").as("ng"),
          col("tr.c").cast("long").as("maxc"),
          col("tr.w").as("gram"))
        .withColumn("frac_bp", expr("10000 * maxc div ng"))
    }
    rung(2).unionByName(rung(3)).unionByName(rung(4))
      .orderBy(col("doc_id"), col("n"))
  }

  // --- cross-family curation funnel ---------------------------------------

  /** Corpus survival through the whole curation cascade in pipeline
    * order — blocklist, code routing, the Gopher battery, exact dedup —
    * the report that decides stage thresholds AND stage ORDER (cheap
    * string filters first is only right if they actually kill enough
    * docs to pay for themselves). Single-sourced: each stage's verdict
    * is the stage query's own per-doc frame ([[badPerDoc]],
    * [[codePerDoc]], [[Quality.qualityFlags]]), joined on doc_id —
    * three co-partitioned joins, one aggregate, a 5-row result at any
    * corpus size (the filter_funnel posture, widened across families).
    * The dedup stage counts distinct surviving texts (first-occurrence
    * canonical, `dedup_exact`'s currency).
    */
  def curationFunnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val j = docs(s, d).select(col("doc_id"), col("text"))
      .join(badPerDoc(s, d).select(col("doc_id"), col("kept").as("p_bw")),
        "doc_id")
      .join(codePerDoc(s, d).select(col("doc_id"), col("is_code")), "doc_id")
      .join(Quality.qualityFlags(s, d)
        .select(col("doc_id"), col("kept").as("p_gopher")), "doc_id")
    val s2 = col("p_bw")
    val s3 = s2 && !col("is_code")
    val s4 = s3 && col("p_gopher")
    val c = j.agg(
      count(lit(1)).as("c0"),
      sum(when(s2, 1L).otherwise(0L)).as("c1"),
      sum(when(s3, 1L).otherwise(0L)).as("c2"),
      sum(when(s4, 1L).otherwise(0L)).as("c3"),
      countDistinct(when(s4, col("text"))).as("c4"))
      .collect()(0) // 1-row funnel scalars (the filterFunnel posture)
    val ns = (0 to 4).map(c.getLong)
    Seq("1_all", "2_badwords", "3_code", "4_gopher", "5_dedup").zipWithIndex
      .map { case (stage, i) =>
        val prev = if (i == 0) ns(0) else ns(i - 1)
        (stage, ns(i), if (prev == 0) 0L else 10000L * (prev - ns(i)) / prev)
      }.toDF("stage", "n_surviving", "drop_bp").orderBy(col("stage"))
  }

  // --- streaming counterpart -------------------------------------------

  /** Streaming blocklist census — the safety gate as a continuously
    * maintained table: each micro-batch computes its own per-source
    * verdict deltas (map-only, the SAME [[badAugCol]]/token-filter
    * definition as the batch census, so the stream can never drift from
    * the declared semantics) and merges them into a
    * [[graft.streaming.MaintainedCounts]] table with the metric encoded
    * in the key (`source|docs`, `source|flagged`, `source|hits`). Rides
    * the versioned-bucket commit protocol unchanged: crash-safe,
    * replay-idempotent, per-batch I/O bounded by the batch's source
    * footprint. StreamingSpec pins stream-then-read equal to
    * [[badwordsCensus]] across a restart.
    */
  def streamingBadwordsCounts(s: SparkSession, sfDir: String,
      streamDir: String, countsDir: String,
      ckpt: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = Tables.documents(s, sfDir).schema
    s.readStream.schema(schema).parquet(streamDir)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = batch.select(col("source"), badAugCol.as("aug"))
          .select(col("source"),
            size(filter(Dedup.tokensNE(col("aug")),
              t => t.isin(Badwords: _*))).cast("long").as("n_hits"))
          .select(explode(array(
            struct(concat(col("source"), lit("|docs")).as("k"),
              lit(1L).as("dc")),
            struct(concat(col("source"), lit("|flagged")).as("k"),
              when(col("n_hits") > 0, 1L).otherwise(0L).as("dc")),
            struct(concat(col("source"), lit("|hits")).as("k"),
              col("n_hits").as("dc")))).as("e"))
          .select(col("e.k").as("k"), col("e.dc").as("dc"))
          .groupBy(col("k")).agg(sum(col("dc")).as("dc"))
        graft.streaming.MaintainedCounts.applyBatch(s, delta, batchId,
          countsDir, numBuckets = graft.streaming.Drift.NumBuckets)
        ()
      }
      .start()
  }

  /** Reconstitute the [[badwordsCensus]] frame from the maintained
    * table: split the metric out of the key and pivot the three counts
    * back into columns (flag rate recomputed exactly as the batch
    * census does).
    */
  def badwordsCensusFromCounts(s: SparkSession, countsDir: String): DataFrame =
    graft.streaming.MaintainedCounts.readCounts(s, countsDir)
      .select(substring_index(col("k"), "|", 1).as("source"),
        substring_index(col("k"), "|", -1).as("metric"), col("c"))
      .groupBy(col("source"))
      .agg(sum(when(col("metric") === "docs", col("c")).otherwise(0L))
          .as("n_docs"),
        sum(when(col("metric") === "flagged", col("c")).otherwise(0L))
          .as("n_flagged"),
        sum(when(col("metric") === "hits", col("c")).otherwise(0L))
          .as("n_hits_total"))
      .withColumn("flag_bp", expr("10000 * n_flagged div n_docs"))
      .orderBy(col("source"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "badwords_filter" -> badwordsFilter,
    "badwords_census" -> badwordsCensus,
    "code_detect" -> codeDetect,
    "code_census" -> codeCensus,
    "repetition_ngram_ladder" -> repetitionNgramLadder,
    "curation_funnel" -> curationFunnel,
  )

  /** One ladder rung of the oracle: grams by parallel unnest of aligned
    * slices, count per (doc, gram), winner by (count DESC, gram) — the
    * topRun tie-break — and slot total by window sum.
    */
  private def rungSql(n: Int): String = {
    val ws = (1 to n).map(k => s"w$k")
    val slices = (1 to n).map { k =>
      val hi = if (n - k == 0) "l" else s"l-${n - k}"
      s"unnest(ts[$k:$hi]) AS w$k"
    }
    s"""b$n AS (SELECT doc_id, ${slices.mkString(", ")}
       |        FROM x WHERE l >= $n),
       |g$n AS (SELECT doc_id, ${ws.mkString(" || ' ' || ")} AS gram,
       |          count(*) AS c
       |        FROM b$n GROUP BY 1, 2),
       |r$n AS (SELECT doc_id, gram, c,
       |          row_number() OVER (PARTITION BY doc_id
       |            ORDER BY c DESC, gram) AS rn,
       |          sum(c) OVER (PARTITION BY doc_id) AS ng
       |        FROM g$n)""".stripMargin
  }

  private def rungSelect(n: Int): String =
    s"""SELECT doc_id, $n::BIGINT AS n, ng::BIGINT AS ng, c::BIGINT AS maxc,
       |  gram, (10000 * c // ng)::BIGINT AS frac_bp
       |FROM r$n WHERE rn = 1""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "badwords_filter" ->
      s"""WITH a AS (SELECT doc_id, $BadAugSql AS text FROM documents),
         |h AS (SELECT doc_id, len(list_filter(${Shared.ToksNE},
         |        t -> t IN ('unsafeword0', 'unsafeword1', 'unsafeword2')))
         |        ::BIGINT AS n_hits
         |      FROM a)
         |SELECT doc_id, n_hits, (n_hits = 0) AS kept
         |FROM h ORDER BY doc_id""".stripMargin,
    "badwords_census" ->
      s"""WITH a AS (SELECT source, $BadAugSql AS text FROM documents),
         |h AS (SELECT source, len(list_filter(${Shared.ToksNE},
         |        t -> t IN ('unsafeword0', 'unsafeword1', 'unsafeword2')))
         |        ::BIGINT AS n_hits
         |      FROM a)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END)::BIGINT AS n_flagged,
         |  sum(n_hits)::BIGINT AS n_hits_total,
         |  (10000 * sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END)
         |    // count(*))::BIGINT AS flag_bp
         |FROM h GROUP BY source ORDER BY source""".stripMargin,
    "code_detect" ->
      s"""WITH a AS (SELECT doc_id, $CodeAugSql AS text FROM documents),
         |m AS (SELECT doc_id, length(text)::BIGINT AS n_chars,
         |        len(regexp_extract_all(text, '$SymRe'))::BIGINT AS n_sym,
         |        len(list_filter(${Shared.ToksNE}, t -> t IN
         |          ('function', 'return', 'var', 'def', 'class', 'import')))
         |          ::BIGINT AS kw_hits
         |      FROM a)
         |SELECT doc_id, n_chars, n_sym,
         |  (10000 * n_sym // n_chars)::BIGINT AS sym_bp, kw_hits,
         |  (kw_hits >= 2 AND 10000 * n_sym // n_chars >= 100) AS is_code
         |FROM m ORDER BY doc_id""".stripMargin,
    "code_census" ->
      s"""WITH a AS (SELECT source, $CodeAugSql AS text FROM documents),
         |m AS (SELECT source,
         |        len(regexp_extract_all(text, '$SymRe'))::BIGINT AS n_sym,
         |        length(text)::BIGINT AS n_chars,
         |        len(list_filter(${Shared.ToksNE}, t -> t IN
         |          ('function', 'return', 'var', 'def', 'class', 'import')))
         |          ::BIGINT AS kw_hits
         |      FROM a),
         |v AS (SELECT source, n_sym,
         |        (kw_hits >= 2 AND 10000 * n_sym // n_chars >= 100) AS is_code
         |      FROM m)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(CASE WHEN is_code THEN 1 ELSE 0 END)::BIGINT AS n_code,
         |  sum(n_sym)::BIGINT AS n_sym_total,
         |  (10000 * sum(CASE WHEN is_code THEN 1 ELSE 0 END)
         |    // count(*))::BIGINT AS code_bp
         |FROM v GROUP BY source ORDER BY source""".stripMargin,
    "curation_funnel" ->
      s"""WITH a AS (SELECT doc_id, $BadAugSql AS text FROM documents),
         |bw AS (SELECT doc_id, (len(list_filter(${Shared.ToksNE},
         |         t -> t IN ('unsafeword0', 'unsafeword1', 'unsafeword2')))
         |         = 0) AS p_bw
         |       FROM a),
         |ca AS (SELECT doc_id, $CodeAugSql AS text FROM documents),
         |cd AS (SELECT doc_id,
         |         (len(list_filter(${Shared.ToksNE}, tk -> tk IN
         |            ('function', 'return', 'var', 'def', 'class', 'import')))
         |            >= 2
         |          AND 10000 * len(regexp_extract_all(text, '$SymRe'))
         |            // length(text) >= 100) AS is_code
         |       FROM ca),
         |${Quality.QualityBatteryCte},
         |gk AS (SELECT doc_id, ((n BETWEEN 5 AND 100000)
         |         AND (10 * sum_len >= 30 * n AND 10 * sum_len <= 100 * n)
         |         AND (50 * n_stop >= n) AND (5 * maxc < n)
         |         AND (10 * n_uniq >= n)) AS p_gopher
         |       FROM p),
         |j AS (SELECT d.doc_id, d.text, bw.p_bw, cd.is_code, gk.p_gopher
         |      FROM documents d
         |      JOIN bw USING (doc_id) JOIN cd USING (doc_id)
         |      JOIN gk USING (doc_id)),
         |c AS (SELECT count(*)::BIGINT AS c0,
         |        sum(CASE WHEN p_bw THEN 1 ELSE 0 END)::BIGINT AS c1,
         |        sum(CASE WHEN p_bw AND NOT is_code
         |            THEN 1 ELSE 0 END)::BIGINT AS c2,
         |        sum(CASE WHEN p_bw AND NOT is_code AND p_gopher
         |            THEN 1 ELSE 0 END)::BIGINT AS c3,
         |        count(DISTINCT CASE WHEN p_bw AND NOT is_code AND p_gopher
         |            THEN text END)::BIGINT AS c4
         |      FROM j)
         |SELECT stage, ns AS n_surviving,
         |  (CASE WHEN prev = 0 THEN 0
         |        ELSE 10000 * (prev - ns) // prev END)::BIGINT AS drop_bp
         |FROM (SELECT unnest(['1_all', '2_badwords', '3_code', '4_gopher',
         |               '5_dedup']) AS stage,
         |             unnest([c0, c1, c2, c3, c4]) AS ns,
         |             unnest([c0, c0, c1, c2, c3]) AS prev
         |      FROM c)
         |ORDER BY stage""".stripMargin,
    "repetition_ngram_ladder" ->
      s"""WITH t AS (SELECT doc_id, ${Shared.ToksNE} AS ts FROM documents),
         |x AS (SELECT doc_id, ts, len(ts) AS l FROM t),
         |${rungSql(2)},
         |${rungSql(3)},
         |${rungSql(4)}
         |${rungSelect(2)}
         |UNION ALL
         |${rungSelect(3)}
         |UNION ALL
         |${rungSelect(4)}
         |ORDER BY doc_id, n""".stripMargin,
  )
}
