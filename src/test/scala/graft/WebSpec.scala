package graft

import org.apache.spark.sql.functions._

/** The web-curation first mile ([[graft.queries.Web]]): HTML → text
  * extraction must recover the original text EXACTLY (markup can never
  * reach the quality battery), URL canonicalization must fix every
  * planted mess, and the blocklist anti-join must broadcast the
  * blocklist side — never shuffle the corpus.
  */
class WebSpec extends SparkSuite {

  test("html extraction recovers every original text exactly") {
    // the semantic gate behind the oracle's hash parity: wrap every
    // fixture doc in the full boilerplate template, extract, and demand
    // byte-identity with the original — so the downstream quality
    // battery provably never sees a tag, entity, or banner line
    val got = SparkEntry.queries("extract_html")(spark, sf0001)
      .select(col("doc_id"), col("text").as("extracted"))
    val orig = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val drifted = got.join(orig, "doc_id")
      .filter(col("extracted") =!= col("text")).count()
    assert(drifted == 0, s"$drifted extractions drifted from the original text")
    val n = got.count()
    assert(n == orig.count(), s"row count drifted: $n")
  }

  test("extraction census: every doc exact, boilerplate lines dropped") {
    val rows = SparkEntry.queries("extract_html_census")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nExact, markup, dropped) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nExact == nDocs, s"${r.getString(0)}: $nExact/$nDocs exact")
      // the template carries ~5 boilerplate lines per doc (title, nav,
      // cookie banner, h1, footer) and a few hundred markup chars
      assert(dropped >= 4 * nDocs && dropped <= 8 * nDocs,
        s"${r.getString(0)}: dropped=$dropped for $nDocs docs")
      assert(markup > 100 * nDocs, s"${r.getString(0)}: markup=$markup")
    }
  }

  test("extraction survives adversarial markup: entities, nested tags, bare <") {
    import spark.implicits._
    // a hand-planted page exercising what the fixture template cannot:
    // entities INSIDE main content, inline tags mid-sentence, a script
    // body with comparison operators, multi-part attributes
    val body = "Benchmarks show A &lt; B &amp; C &gt; D for the " +
      "quoted &quot;fast path&quot; in today&#39;s release notes here."
    val expected = "Benchmarks show A < B & C > D for the " +
      "quoted \"fast path\" in today's release notes here."
    val html = "<html><head><style>.x{a:1}</style>" +
      "<script>if (a < b && c > d) { run(\"quoted\"); }</script></head>" +
      "<body><nav>Home | About</nav><p>" + body.replace(
        "show A", "show <b>A</b>").replace("release", "<i>release</i>") +
      "</p><footer>fin</footer></body></html>"
    val df = Seq((1L, html)).toDF("doc_id", "html")
    val out = df.select(graft.queries.Web.extractForTest(col("html")).as("t"))
      .collect()(0).getString(0)
    assert(out == expected, s"adversarial extraction drifted:\n$out\n$expected")
  }

  test("url canonicalization fixes every planted mess") {
    val rows = SparkEntry.queries("url_canonicalize")(spark, sf0001)
      .collect()
    rows.foreach { r =>
      val (id, url, canon, dom) =
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))
      assert(!canon.contains("#"), s"$id: fragment survived: $canon")
      assert(!canon.contains("utm_"), s"$id: tracking param survived: $canon")
      assert(!canon.contains(":443"), s"$id: default port survived: $canon")
      assert(!canon.matches("https://www\\..*"), s"$id: www survived: $canon")
      assert(canon == canon.toLowerCase ||
        canon.indexOf('?') >= 0 && canon.take(canon.indexOf('?'))
          == canon.take(canon.indexOf('?')).toLowerCase,
        s"$id: host case survived: $canon")
      assert(!canon.matches(".*/p/\\d+/($|\\?.*)"),
        s"$id: trailing slash survived: $canon")
      if (id % 3 == 1)
        assert(canon.contains("?id="), s"$id: real param lost: $canon")
      // registered domain: 3 labels under .co.uk, 2 under .com
      if (id % 3 == 0) assert(dom.endsWith(".co.uk") &&
        dom.count(_ == '.') == 2, s"$id: bad eTLD+1 $dom for $url")
      else assert(dom.endsWith(".com") && dom.count(_ == '.') == 1,
        s"$id: bad eTLD+1 $dom for $url")
    }
  }

  test("domain blocklist anti-join broadcasts the blocklist, drops its domains") {
    val df = SparkEntry.queries("domain_blocklist")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"blocklist anti-join is not a broadcast hash join:\n${plan.take(600)}")
    val doms = df.collect().map(_.getString(0)).toSet
    assert(!doms.contains("src1.com") && !doms.contains("src4.co.uk"),
      s"blocklisted domain survived: $doms")
    assert(doms.exists(_.endsWith(".com")), s"kept set suspicious: $doms")
  }
}
