package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** INDEPENDENT reference implementation of BPE encoding: apply each
  * learned merge IN LEARNED ORDER, sweeping until that pair is gone,
  * before moving to the next. This is a different algorithm shape from
  * the production encoder (which always merges the lowest-rank pair
  * still present); the two are provably equivalent — a merge can only
  * create pairs containing its new symbol, and every pair containing a
  * symbol born at rank r was necessarily learned after r — so agreement
  * across the whole corpus is a real cross-check, not a mirror.
  */
object BpeRef {
  def pretokenize(text: String): Vector[String] = {
    val m = java.util.regex.Pattern.compile(Bpe.PreTokenRe).matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  def encodeInOrder(word: String, merges: Array[String]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    merges.foreach { m =>
      val sp = m.indexOf(' ')
      val l = m.substring(0, sp); val r = m.substring(sp + 1)
      var changed = true
      while (changed) {
        val out = Vector.newBuilder[String]
        var i = 0
        var any = false
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += syms(i) + syms(i + 1); i += 2; any = true
          } else { out += syms(i); i += 1 }
        }
        syms = out.result(); changed = any
      }
    }
    syms
  }

  def countText(text: String, merges: Array[String]): Long =
    pretokenize(text).map { p =>
      val c = p.charAt(0)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))
        encodeInOrder(p, merges).length.toLong
      else 1L
    }.sum
}

class BpeSpec extends SparkSuite {

  test("train: hand-computed merge sequence on the classic toy corpus") {
    // hug:10 pug:5 pun:12 bun:4 hugs:5 — pair counts round by round are
    // small enough to verify by hand (see inline arithmetic)
    val corpus = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))
    val merges = Bpe.train(corpus, 5)
    // r1: (u,g)=10+5+5=20 beats (p,u)=17, (u,n)=16, (h,u)=15
    // r2: (u,n)=16 beats (h,ug)=15
    // r3: (h,ug)=15   r4: (p,un)=12
    // r5: (hug,s)=5 ties (p,ug)=5 — lexicographic left "hug" < "p" wins
    assert(merges.toSeq == Seq("u g", "u n", "h ug", "p un", "hug s"))
  }

  test("train then encode: merged symbols reconstruct each word exactly") {
    val corpus = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))
    val merges = Bpe.train(corpus, 5)
    corpus.foreach { case (w, _) =>
      val syms = BpeRef.encodeInOrder(w, merges)
      assert(syms.mkString == w, s"$w -> $syms")
      assert(Bpe.countWord(w, Bpe.ranksOf(merges)) == syms.length.toLong)
    }
    // "hugs" fully merges; "bun" = [b, un]; "pug" = [p, ug] (never learned)
    assert(BpeRef.encodeInOrder("hugs", merges) == Vector("hugs"))
    assert(BpeRef.encodeInOrder("bun", merges) == Vector("b", "un"))
    assert(BpeRef.encodeInOrder("pug", merges) == Vector("p", "ug"))
  }

  test("encoder equivalence: lowest-rank-first == in-learned-order on every corpus word") {
    // sf0.01: the synthetic vocab at sf0.001 is only ~31 distinct runs;
    // the bigger corpus exercises more merge interactions
    val merges = graft.queries.Quality.bpeMerges(spark, sf001)
    // the synthetic vocabulary is small enough that training can run dry
    // (every word a single symbol) before the 200-merge cap — correct
    // termination, not a bug; just require a real table
    assert(merges.length >= 50, s"expected a substantial merge table, got ${merges.length}")
    val ranks = Bpe.ranksOf(merges)
    val words = spark.read.parquet(s"$sf001/documents.parquet")
      .select(explode(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0))).as("w"))
      .distinct().collect().map(_.getString(0))
    assert(words.length > 30, "corpus must exercise a real vocabulary")
    words.foreach { w =>
      val got = Bpe.countWord(w, ranks)
      val ref = BpeRef.encodeInOrder(w, merges).length.toLong
      assert(got == ref, s"word '$w': encoder $got != reference $ref")
    }
  }

  test("bpe_word_tokens: corpus-complete and every count matches the reference") {
    val merges = graft.queries.Quality.bpeMerges(spark, sf0001)
    val table = graft.queries.Quality.bpeWordTokens(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val words = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0))).as("w"))
      .distinct().collect().map(_.getString(0))
    assert(words.toSet == table.keySet, "the encoder table must cover exactly the corpus vocabulary")
    words.foreach { w =>
      assert(table(w) == BpeRef.encodeInOrder(w, merges).length.toLong, s"word '$w'")
    }
  }

  test("countText: whole-document charge equals the reference on corpus rows") {
    val merges = graft.queries.Quality.bpeMerges(spark, sf0001)
    val ranks = Bpe.ranksOf(merges)
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("text")).limit(200).collect().map(_.getString(0))
    texts.foreach { t =>
      assert(Bpe.countText(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), ranks) ==
        BpeRef.countText(t, merges))
    }
  }

  test("byte fallback: alpha-run results unchanged, multibyte charged per byte") {
    val merges = graft.queries.Quality.bpeMerges(spark, sf0001)
    val ranks = Bpe.ranksOf(merges)
    def bytes(t: String) = Bpe.countTextBytes(
      org.apache.spark.unsafe.types.UTF8String.fromString(t), ranks)
    def chars(t: String) = Bpe.countText(
      org.apache.spark.unsafe.types.UTF8String.fromString(t), ranks)
    // (1) the declared invariant: on pure-ASCII text the two currencies
    // are IDENTICAL — every fixture doc, not a sample
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("text")).collect().map(_.getString(0)).foreach { t =>
        assert(bytes(t) == chars(t), s"ASCII drift on: ${t.take(60)}")
      }
    // (2) pinned multibyte charges: CJK 3 B/char, Cyrillic 2 B/char,
    // em dash 3 B, euro 3 B, copyright 2 B; ASCII digit/punct still 1
    assert(bytes("数据") == 6L)
    assert(bytes("мир") == 6L)
    assert(bytes("—") == 3L && bytes("€") == 3L && bytes("©") == 2L)
    assert(bytes("7") == 1L && bytes(";") == 1L)
    // (3) mixed: alpha run charged its BPE count, accents fall back
    val caf = Bpe.countWord("caf", ranks)
    assert(bytes("café") == caf + 2L, s"café: ${bytes("café")} vs $caf+2")
    // (4) a document-shaped mix agrees with piece-wise arithmetic
    val mixed = "the data 数据 ok"
    val alpha = Seq("the", "data", "ok").map(Bpe.countWord(_, ranks)).sum
    assert(bytes(mixed) == alpha + 6L, s"mixed: ${bytes(mixed)}")
  }
}
