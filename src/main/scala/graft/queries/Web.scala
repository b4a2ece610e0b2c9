package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-pipeline curation stages (VERDICT r16 gaps #2 and #3): the two
  * steps a crawl pipeline runs BEFORE any quality filter sees a byte —
  * HTML → main-content text extraction (the trafilatura/jusText job)
  * and URL/domain curation (the CCNet/RefinedWeb domain stage).
  *
  * The fixture `documents` table is plain text with no URL column, so
  * both families construct their raw inputs IN-EXPRESSION from the
  * parquet columns (deterministic templates over doc_id/lang/source/
  * text): Spark and DuckDB read the SAME parquet bytes, build the SAME
  * markup/URLs, and must land on identical extractions — hash parity
  * over the whole pipeline, construction included. HtmlExtractSpec
  * additionally pins the SEMANTIC contract: extraction recovers the
  * original text exactly, so markup can never reach the downstream
  * quality battery.
  *
  * Scale notes: every query here is map-only until its final census
  * aggregate — extraction/canonicalization are per-row expression
  * chains (whole-stage codegen'd regexp/string ops, no UDFs), so at
  * 100 TB they ride the ingest scan. The blocklist anti-join
  * broadcasts the (tiny, fixed) blocklist side — never the corpus.
  * Reference analog: the raw text source (`distwc.c:9`) — this is the
  * step that turns raw crawl bytes into the text that source feeds on.
  */
object Web {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  // --- HTML -> text extraction ------------------------------------------

  /** Deterministic page template: real text wrapped in the boilerplate a
    * crawler actually sees — head/title, style and script blocks (the
    * script body contains a bare `<` to prove block removal is not
    * tag-pair naive), an HTML comment, nav links with entities, a cookie
    * banner, and a footer. Single-line on purpose: block-level tags are
    * what delimit lines after extraction.
    */
  private def htmlCol: Column = concat(
    lit("<html lang=\""), col("lang"),
    lit("\"><head><title>doc "), col("doc_id").cast("string"),
    lit("</title><style>body { margin: 0; } .nav { color: #333; }</style>" +
      "<script>var t = \"x-"), col("doc_id").cast("string"),
    lit("\"; if (t < \"y\") { t = null; }</script></head><body>" +
      "<!-- layout: 3col --><nav><a href=\"/\">Home</a> | " +
      "<a href=\"/about\">About</a> &amp; <a href=\"/contact\">Contact</a></nav>" +
      "<div class=\"cookie\">We use cookies &amp; trackers</div>" +
      "<h1>Source "), col("source"),
    lit("</h1><p>"), col("text"),
    lit("</p><footer>&copy; example.com</footer></body></html>"))

  /** The shared DuckDB twin of [[htmlCol]] (same template text). */
  private val HtmlSql =
    "'<html lang=\"' || lang || '\"><head><title>doc ' || doc_id::VARCHAR" +
      " || '</title><style>body { margin: 0; } .nav { color: #333; }</style>" +
      "<script>var t = \"x-' || doc_id::VARCHAR" +
      " || '\"; if (t < \"y\") { t = null; }</script></head><body>" +
      "<!-- layout: 3col --><nav><a href=\"/\">Home</a> | " +
      "<a href=\"/about\">About</a> &amp; <a href=\"/contact\">Contact</a></nav>" +
      "<div class=\"cookie\">We use cookies &amp; trackers</div>" +
      "<h1>Source ' || source || '</h1><p>' || text ||" +
      " '</p><footer>&copy; example.com</footer></body></html>'"

  /** Tag names whose open/close delimits a content line. `\b` keeps
    * `<p>` from also eating `<pre...>` via the attribute tail.
    */
  private val BlockTags =
    "(?i)</?(?:title|p|div|nav|footer|header|section|article|h[1-6]" +
      "|ul|ol|li|table|tr|td|th|br|head|body|html)\\b[^>]*>"

  /** Main-content extraction as a pure expression chain (identical in
    * both dialects; RE2-safe — inline flags, lazy quantifiers, no
    * backreferences):
    *
    *  1. drop `<script>`/`<style>` BLOCKS (content included — markup
    *     inside them is not text), then HTML comments;
    *  2. block-level tags become line breaks, every remaining tag
    *     (inline `<a>`/`<b>`/…) vanishes in place;
    *  3. decode the core entities (`&amp;` LAST, the single-pass order
    *     that keeps `&amp;lt;` decoding to the literal `&lt;`);
    *  4. the line-density rule: keep trimmed lines >= 40 chars — nav
    *     crumbs, cookie banners, titles and footers fall below it,
    *     main content (fixture min 47 chars) clears it. jusText's
    *     length-threshold heuristic, expression-level.
    */
  private def extractCol(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", "")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", "")
    val blocked = regexp_replace(noComment, BlockTags, "\n")
    val noTags = regexp_replace(blocked, "<[^>]*>", "")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => regexp_replace(c, e, ch) }
    array_join(
      filter(transform(split(decoded, "\n"), x => trim(x)),
        x => length(x) >= 40),
      "\n")
  }

  /** The DuckDB twin of [[extractCol]] applied to a SQL fragment. */
  private def extractSql(html: String): String = {
    val noScript =
      s"regexp_replace($html, '(?is)<script\\b[^>]*>.*?</script>', '', 'g')"
    val noStyle =
      s"regexp_replace($noScript, '(?is)<style\\b[^>]*>.*?</style>', '', 'g')"
    val noComment = s"regexp_replace($noStyle, '(?s)<!--.*?-->', '', 'g')"
    val blocked = s"regexp_replace($noComment, '$BlockTags', chr(10), 'g')"
    val noTags = s"regexp_replace($blocked, '<[^>]*>', '', 'g')"
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => s"replace($c, '$e', '$ch')" }
    s"array_to_string(list_filter(list_transform(string_split($decoded, " +
      s"chr(10)), x -> trim(x)), x -> length(x) >= 40), chr(10))"
  }

  /** Test seam: the extraction chain over an arbitrary html column
    * (WebSpec's adversarial-markup cases run pages the fixture template
    * cannot express).
    */
  def extractForTest(html: Column): Column = extractCol(html)

  /** Per-document extraction: the text that would feed the quality
    * battery, plus the markup/text sizes a pipeline tracks. Map-only.
    */
  def extractHtml(s: SparkSession, d: String): DataFrame = {
    val h = docs(s, d).withColumn("html", htmlCol)
    h.select(col("doc_id"), extractCol(col("html")).as("text"),
        length(col("html")).cast("long").as("n_chars_html"))
      .withColumn("n_chars_text", length(col("text")).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** Per-source extraction health card: how much markup was removed,
    * how many boilerplate lines the density rule dropped, and — the
    * honesty gate — how many extractions recovered the original text
    * EXACTLY (must equal n_docs on this fixture; the oracle recomputes
    * the same equality from the same bytes). One aggregate after the
    * map-only extraction.
    */
  def extractHtmlCensus(s: SparkSession, d: String): DataFrame = {
    val h = docs(s, d).withColumn("html", htmlCol)
      .withColumn("extracted", extractCol(col("html")))
      .withColumn("lines",
        filter(transform(split(
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            col("html"),
            "(?is)<script\\b[^>]*>.*?</script>", ""),
            "(?is)<style\\b[^>]*>.*?</style>", ""),
            BlockTags, "\n"),
            "<[^>]*>", ""),
          "\n"), x => trim(x)), x => length(x) >= lit(1)))
    h.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("extracted") === col("text"), 1L).otherwise(0L))
          .as("n_exact"),
        sum((length(col("html")) - length(col("extracted"))).cast("long"))
          .as("n_markup_chars"),
        sum((size(col("lines")) -
          size(filter(col("lines"), x => length(x) >= 40))).cast("long"))
          .as("n_lines_dropped"))
      .orderBy(col("source"))
  }

  // --- URL / domain curation --------------------------------------------

  /** Deterministic raw URL per document — deliberately messy in every
    * axis canonicalization must fix: mixed-case hosts, `www.` prefixes,
    * explicit default ports, trailing slashes, `utm_*` tracking params
    * mixed with real ones, and fragments. Registered domains span both
    * a simple suffix (`.com`) and a multi-part one (`.co.uk`).
    */
  private def urlCol: Column = {
    val dom = concat(col("source"),
      when(col("doc_id") % 3 === 0, lit(".co.uk")).otherwise(lit(".com")))
    val host = when(col("doc_id") % 4 === 0, concat(lit("www."), dom))
      .when(col("doc_id") % 4 === 1, concat(lit("blog."), dom))
      .when(col("doc_id") % 4 === 2, upper(dom))
      .otherwise(dom)
    val port = when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit(""))
    val path = concat(lit("/p/"), col("doc_id").cast("string"),
      when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")))
    val query = when(col("doc_id") % 3 === 0,
        concat(lit("?utm_source=feed&utm_medium=rss&ref="),
          (col("doc_id") % 10).cast("string")))
      .when(col("doc_id") % 3 === 1,
        concat(lit("?id="), (col("doc_id") % 10).cast("string")))
      .otherwise(lit(""))
    val frag = when(col("doc_id") % 7 === 0, lit("#sec-2")).otherwise(lit(""))
    concat(lit("https://"), host, port, path, query, frag)
  }

  /** DuckDB twin of [[urlCol]]. */
  private val UrlSql =
    """'https://' ||
      |  CASE WHEN doc_id % 4 = 0 THEN 'www.' || dom
      |       WHEN doc_id % 4 = 1 THEN 'blog.' || dom
      |       WHEN doc_id % 4 = 2 THEN upper(dom)
      |       ELSE dom END ||
      |  CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END ||
      |  '/p/' || doc_id::VARCHAR ||
      |  CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
      |  CASE WHEN doc_id % 3 = 0
      |         THEN '?utm_source=feed&utm_medium=rss&ref=' || (doc_id % 10)::VARCHAR
      |       WHEN doc_id % 3 = 1 THEN '?id=' || (doc_id % 10)::VARCHAR
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 7 = 0 THEN '#sec-2' ELSE '' END""".stripMargin

  /** `dom` CTE fragment shared by the UrlSql twin. */
  private val DomSql =
    "source || CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END"

  /** Canonical form: lowercase host, `www.` and default ports stripped,
    * trailing path slash trimmed (root stays `/`), `utm_*` params
    * dropped (other params kept in order), fragment removed.
    */
  private def canonCol(url: Column): Column = {
    val host = lower(regexp_extract(url, "^https://([^/?#]+)", 1))
    val host2 = regexp_replace(regexp_replace(host, ":(443|80)$", ""),
      "^www\\.", "")
    val path = regexp_extract(url, "^https://[^/?#]+([^?#]*)", 1)
    val path2 = when(regexp_replace(path, "/$", "") === "", lit("/"))
      .otherwise(regexp_replace(path, "/$", ""))
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_join(
      filter(split(q, "&"), x => !x.startsWith("utm_")), "&")
    concat(lit("https://"), host2, path2,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** DuckDB twin of [[canonCol]] over a `url` column. */
  private val CanonSql =
    """'https://' || host2 || path2 ||
      |  CASE WHEN kept = '' THEN '' ELSE '?' || kept END""".stripMargin

  /** The host/path/query canonicalization CTE the oracle shares. */
  private val CanonCtes =
    """SELECT doc_id, url,
      |  regexp_replace(regexp_replace(
      |    lower(regexp_extract(url, '^https://([^/?#]+)', 1)),
      |    ':(443|80)$', ''), '^www\.', '') AS host2,
      |  CASE WHEN regexp_replace(
      |         regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1), '/$', '') = ''
      |       THEN '/'
      |       ELSE regexp_replace(
      |         regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1), '/$', '') END
      |    AS path2,
      |  array_to_string(list_filter(string_split(
      |    regexp_extract(url, '\?([^#]*)', 1), '&'),
      |    x -> NOT starts_with(x, 'utm_')), '&') AS kept""".stripMargin

  /** Registered domain (eTLD+1) from a canonical host: last two labels,
    * or last three when the two-label tail is a known multi-part public
    * suffix. The suffix set here is the bounded fixture slice of the
    * public-suffix list — at 100 TB the full PSL is still only ~10k
    * rows, a broadcast map by construction.
    */
  private val MultiSuffixes = Seq("co.uk", "org.uk", "ac.uk", "com.au", "co.jp")

  private def regDomCol(host: Column): Column = {
    val ls = split(host, "\\.")
    val last2 = concat_ws(".", element_at(ls, -2), element_at(ls, -1))
    val last3 = concat_ws(".", element_at(ls, -3), element_at(ls, -2),
      element_at(ls, -1))
    when(size(ls) >= 3 && last2.isin(MultiSuffixes: _*), last3)
      .otherwise(when(size(ls) >= 2, last2).otherwise(host))
  }

  /** DuckDB twin of [[regDomCol]] over a `host2` column (list `ls`). */
  private val RegDomSql =
    """CASE WHEN len(ls) >= 3 AND (ls[-2] || '.' || ls[-1]) IN
      |       ('co.uk', 'org.uk', 'ac.uk', 'com.au', 'co.jp')
      |     THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
      |     WHEN len(ls) >= 2 THEN ls[-2] || '.' || ls[-1]
      |     ELSE host2 END""".stripMargin

  /** Raw → canonical URL per document, with the registered domain the
    * downstream census keys on. Map-only expression chain.
    */
  def urlCanonicalize(s: SparkSession, d: String): DataFrame = {
    val u = docs(s, d).select(col("doc_id"), urlCol.as("url"))
    u.select(col("doc_id"), col("url"),
        canonCol(col("url")).as("url_canon"))
      .withColumn("domain", regDomCol(
        regexp_extract(col("url_canon"), "^https://([^/?#]+)", 1)))
      .orderBy(col("doc_id"))
  }

  /** Per-registered-domain census — the CCNet domain stage: doc count,
    * distinct-text count (exact dedup currency), the dup rate in exact
    * bp, and each domain's share of the corpus in bp (one-row
    * corpus-total scalar broadcast — the allowlisted house pattern).
    */
  def domainCensus(s: SparkSession, d: String): DataFrame = {
    val u = docs(s, d).select(col("text"), urlCol.as("url"))
      .withColumn("domain", regDomCol(lower(regexp_replace(
        regexp_extract(col("url"), "^https://([^/?#]+)", 1),
        ":(443|80)$", ""))))
      .withColumn("domain", regexp_replace(col("domain"), "^www\\.", ""))
    val per = u.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_texts"))
      .withColumn("dup_bp",
        expr("10000 * (n_docs - n_distinct_texts) div n_docs"))
    val total = docs(s, d).agg(count(lit(1)).as("n_total"))
    per.crossJoin(broadcast(total))
      .withColumn("share_bp", expr("10000 * n_docs div n_total"))
      .select(col("domain"), col("n_docs"), col("n_distinct_texts"),
        col("dup_bp"), col("share_bp"))
      .orderBy(col("domain"))
  }

  /** Blocklisted registered domains — the fixture slice of a
    * production blocklist (which is millions of rows but still the
    * BROADCAST side: the corpus is the big side, always).
    */
  private val Blocklist = Seq("src1.com", "src4.co.uk", "spam.example")

  /** Blocklist anti-join: per-domain doc counts AFTER removing
    * blocklisted registered domains. The blocklist side carries an
    * explicit broadcast hint — at 100 TB the anti-join must be a
    * broadcast hash join against the corpus scan, never a shuffle of
    * the corpus (WebSpec pins the plan).
    */
  def domainBlocklist(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val u = docs(s, d).select(urlCol.as("url"))
      .withColumn("domain", regDomCol(lower(regexp_replace(
        regexp_extract(col("url"), "^https://([^/?#]+)", 1),
        ":(443|80)$", ""))))
      .withColumn("domain", regexp_replace(col("domain"), "^www\\.", ""))
    val bl = Blocklist.toDF("domain")
    u.join(broadcast(bl), Seq("domain"), "left_anti")
      .groupBy(col("domain")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("domain"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "extract_html" -> extractHtml,
    "extract_html_census" -> extractHtmlCensus,
    "url_canonicalize" -> urlCanonicalize,
    "domain_census" -> domainCensus,
    "domain_blocklist" -> domainBlocklist,
  )

  def oracleSql: Map[String, String] = Map(
    "extract_html" ->
      s"""WITH h AS (SELECT doc_id, $HtmlSql AS html FROM documents)
         |SELECT doc_id, ${extractSql("html")} AS text,
         |  length(html)::BIGINT AS n_chars_html,
         |  length(${extractSql("html")})::BIGINT AS n_chars_text
         |FROM h ORDER BY doc_id""".stripMargin,
    "extract_html_census" ->
      s"""WITH h AS (SELECT doc_id, text, source, $HtmlSql AS html
         |           FROM documents),
         |e AS (SELECT source, text, html, ${extractSql("html")} AS extracted,
         |  list_filter(list_transform(string_split(
         |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
         |      '(?is)<script\\b[^>]*>.*?</script>', '', 'g'),
         |      '(?is)<style\\b[^>]*>.*?</style>', '', 'g'),
         |      '$BlockTags', chr(10), 'g'),
         |      '<[^>]*>', '', 'g'),
         |    chr(10)), x -> trim(x)), x -> length(x) >= 1) AS lines
         |  FROM h)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(CASE WHEN extracted = text THEN 1 ELSE 0 END)::BIGINT AS n_exact,
         |  sum(length(html) - length(extracted))::BIGINT AS n_markup_chars,
         |  sum(len(lines) - len(list_filter(lines, x -> length(x) >= 40)))::BIGINT
         |    AS n_lines_dropped
         |FROM e GROUP BY source ORDER BY source""".stripMargin,
    "url_canonicalize" ->
      s"""WITH d AS (SELECT doc_id, $DomSql AS dom FROM documents),
         |u AS (SELECT doc_id, $UrlSql AS url FROM d),
         |c AS ($CanonCtes FROM u),
         |k AS (SELECT doc_id, url, $CanonSql AS url_canon,
         |        string_split(host2, '.') AS ls, host2 FROM c)
         |SELECT doc_id, url, url_canon, $RegDomSql AS domain
         |FROM k ORDER BY doc_id""".stripMargin,
    "domain_census" ->
      s"""WITH d AS (SELECT doc_id, text, $DomSql AS dom FROM documents),
         |u AS (SELECT doc_id, text, $UrlSql AS url FROM d),
         |h AS (SELECT text, regexp_replace(regexp_replace(lower(
         |        regexp_extract(url, '^https://([^/?#]+)', 1)),
         |        ':(443|80)$$', ''), '^www\\.', '') AS host2 FROM u),
         |k AS (SELECT text, string_split(host2, '.') AS ls, host2 FROM h),
         |g AS (SELECT $RegDomSql AS domain, count(*)::BIGINT AS n_docs,
         |        count(DISTINCT text)::BIGINT AS n_distinct_texts
         |      FROM k GROUP BY 1),
         |t AS (SELECT count(*)::BIGINT AS n_total FROM documents)
         |SELECT domain, n_docs, n_distinct_texts,
         |  (10000 * (n_docs - n_distinct_texts) // n_docs)::BIGINT AS dup_bp,
         |  (10000 * n_docs // n_total)::BIGINT AS share_bp
         |FROM g, t ORDER BY domain""".stripMargin,
    "domain_blocklist" ->
      s"""WITH d AS (SELECT doc_id, $DomSql AS dom FROM documents),
         |u AS (SELECT doc_id, $UrlSql AS url FROM d),
         |h AS (SELECT regexp_replace(regexp_replace(lower(
         |        regexp_extract(url, '^https://([^/?#]+)', 1)),
         |        ':(443|80)$$', ''), '^www\\.', '') AS host2 FROM u),
         |k AS (SELECT string_split(host2, '.') AS ls, host2 FROM h),
         |r AS (SELECT $RegDomSql AS domain FROM k)
         |SELECT domain, count(*)::BIGINT AS n_docs FROM r
         |WHERE domain NOT IN ('src1.com', 'src4.co.uk', 'spam.example')
         |GROUP BY domain ORDER BY domain""".stripMargin,
  )
}
