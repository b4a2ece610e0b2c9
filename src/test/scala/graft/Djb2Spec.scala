package graft

import graft.functions.{Djb2, Djb2Partitioner}
import org.scalatest.funsuite.AnyFunSuite

/** djb2 parity with the reference partitioner (`mapreduce.c:154-160`),
  * pinned by the golden partition layout measured from the reference
  * binary's own 1-worker run (FIXTURES.md §1).
  */
class Djb2Spec extends AnyFunSuite {

  // Ground-truth layout from the reference's result-<p>.txt files
  val goldenLayout: Map[Int, Set[String]] = Map(
    0 -> Set("a", "and"),
    2 -> Set("each", "for", "should"),
    3 -> Set("input", "mapreduce", "test", "times"),
    4 -> Set("occurs", "the"),
    5 -> Set("This", "exactly", "word"),
    6 -> Set("five-thousand", "library", "see", "you"),
    8 -> Set("expect", "to"),
    9 -> Set("is"),
  )

  test("partition layout matches the reference binary (21-word corpus, P=10)") {
    for ((pid, words) <- goldenLayout; w <- words)
      assert(Djb2.partition(w, 10) == pid, s"word '$w'")
  }

  test("empty key hashes to partition 1 (observed empty-token semantics)") {
    assert(Djb2.partition("", 10) == 1) // djb2("") == 5381; 5381 % 10 == 1
  }

  test("reference C semantics: signed-char bytes, uint64 wrap, unsigned mod") {
    // bytes >= 0x80 sign-extend like C's (int)(char) on x86
    val high = new String(Array(0xC3.toByte, 0xA9.toByte), "ISO-8859-1") // 2 raw bytes
    var h = 5381L
    for (b <- high.getBytes("ISO-8859-1")) h = h * 33 + b // b: signed Byte
    assert(Djb2.hash(high.getBytes("ISO-8859-1")) == h)
    // unsigned modulo: a hash with the sign bit set must not go negative
    val k = "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa" // long enough to wrap
    assert(Djb2.partition(k, 10) >= 0)
    assert(Djb2.partition(k, 10) ==
      java.lang.Long.remainderUnsigned(Djb2.hash(k), 10L).toInt)
  }

  test("Djb2Partitioner agrees with scalar djb2 for arbitrary strings") {
    val part = new Djb2Partitioner(10)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val s = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
      assert(part.getPartition(s) == Djb2.partition(s, 10))
      assert(part.getPartition(s) >= 0 && part.getPartition(s) < 10)
    }
  }

  test("column expression matches scalar implementation") {
    val spark = SparkSuite.spark
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val words = Seq("This", "a", "", "five-thousand", "zebra", "ünïcödé")
    val got = words.toDF("w")
      .select(col("w"), Djb2.djb2(col("w")).as("h"), Djb2.djb2Pid(col("w"), 10).as("p"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((w, h, p) <- got) {
      assert(h == Djb2.hash(w), s"hash('$w')")
      assert(p == Djb2.partition(w, 10).toLong, s"pid('$w')")
    }
  }

  test("Utf8ByteOrdering == strcmp (unsigned UTF-8 bytes), incl. supplementary chars") {
    def strcmp(a: String, b: String): Int = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff).compare(y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length.compare(y.length)
    }
    // the divergence case: U+1F600 (surrogate pair, UTF-8 F0 9F 98 80)
    // vs U+E000 (UTF-8 EE 80 80) — UTF-16 order says emoji < U+E000,
    // byte order says the opposite
    val emoji = new String(Character.toChars(0x1F600))
    val pua = "\uE000"
    assert(Ordering.String.compare(emoji, pua) < 0) // JVM default disagrees...
    assert(graft.functions.Utf8ByteOrdering.compare(emoji, pua) > 0) // ...we match strcmp
    val rnd = new scala.util.Random(7)
    val pool = Seq("", "a", "This", "ÿ", emoji, pua, "z", "zz",
      // UNPAIRED surrogates: the encoder writes '?' for them, and the
      // comparator must order by those written bytes, not char values
      "\uD800", "\uDC00", "\uD800A")
    for (_ <- 1 to 2000) {
      val a = (0 until rnd.nextInt(4)).map(_ => pool(rnd.nextInt(pool.size))).mkString
      val b = (0 until rnd.nextInt(4)).map(_ => pool(rnd.nextInt(pool.size))).mkString
      assert(math.signum(graft.functions.Utf8ByteOrdering.compare(a, b)) ==
        math.signum(strcmp(a, b)), s"'$a' vs '$b'")
    }
  }
}
