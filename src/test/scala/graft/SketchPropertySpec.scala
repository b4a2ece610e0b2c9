package graft

import graft.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws for the codegen'd sketch expressions, evaluated
  * through the interpreted `nullSafeEval` path with Catalyst literals
  * (no SparkSession — the engine specs already pin interpreted==codegen
  * on real plans). These are the algebraic laws LSH correctness rests
  * on: if the min-law fails, band-bucket candidate generation silently
  * loses near-duplicate pairs.
  */
class SketchPropertySpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(300)
      .withInitialSeed(0x5EEDL)
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name failed: ${r.status}")
  }

  private def arrLit(xs: Seq[Long]): Literal =
    Literal.create(xs, ArrayType(LongType, containsNull = false))

  private val anyLong: Gen[Long] = Gen.choose(Long.MinValue, Long.MaxValue)
  private val seedGen: Gen[Long] = Gen.choose(0L, Long.MaxValue)

  // --- MinHash ----------------------------------------------------------
  // the documented input contract: base hashes in [0, 2^31) so a*h stays
  // within int64 (SketchExprs.minhashSig scaladoc)
  private val P = 4294967311L // prime > 2^32, the production modulus shape
  private val permGen: Gen[(Array[Long], Array[Long])] = for {
    k <- Gen.choose(1, 16)
    a <- Gen.listOfN(k, Gen.choose(1L, (1L << 31) - 1))
    b <- Gen.listOfN(k, Gen.choose(0L, (1L << 31) - 1))
  } yield (a.toArray, b.toArray)
  private val hashSetGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.choose(0L, (1L << 31) - 1))

  private def sig(xs: Seq[Long], a: Array[Long], b: Array[Long]): Seq[Long] =
    MinHashSigExpr(arrLit(xs), a, b, P).eval(null)
      .asInstanceOf[ArrayData].toLongArray().toSeq

  test("MinHash signature obeys the union min-law") {
    // sig(A ∪ B) = elementwise min(sig(A), sig(B)) — the law that makes
    // signatures composable and band-bucket LSH sound
    check("minhash-minlaw")(Prop.forAll(permGen, hashSetGen, hashSetGen) {
      case ((a, b), ha, hb) =>
        sig(ha ++ hb, a, b) ==
          sig(ha, a, b).zip(sig(hb, a, b)).map { case (x, y) => math.min(x, y) }
    })
  }

  test("MinHash signature is order- and duplicate-insensitive") {
    check("minhash-set")(Prop.forAll(permGen, hashSetGen, seedGen) {
      case ((a, b), hs, seed) =>
        val shuffled = new scala.util.Random(seed).shuffle(hs)
        sig(shuffled, a, b) == sig(hs, a, b) && sig(hs ++ hs, a, b) == sig(hs, a, b)
    })
  }

  // --- SimHash ----------------------------------------------------------
  private def sim(xs: Seq[Long]): Long =
    SimHash64Expr(arrLit(xs)).eval(null).asInstanceOf[Long]

  test("SimHash: permutation-invariant, singleton identity, 2-vs-1 majority") {
    check("simhash-perm")(Prop.forAll(Gen.nonEmptyListOf(anyLong), seedGen) {
      (hs, seed) => sim(new scala.util.Random(seed).shuffle(hs)) == sim(hs)
    })
    // one element: every bit's majority IS that element's bit
    check("simhash-single")(Prop.forAll(anyLong)(h => sim(Seq(h)) == h))
    // two copies outvote one dissenter at every bit position
    check("simhash-majority")(Prop.forAll(anyLong, anyLong) {
      (x, y) => sim(Seq(x, x, y)) == x
    })
  }

  // --- sorted intersect -------------------------------------------------
  test("sorted-intersect count equals set intersection size") {
    check("isect")(Prop.forAll(Gen.listOf(anyLong), Gen.listOf(anyLong)) {
      (xs, ys) =>
        val (sa, sb) = (xs.toSet, ys.toSet)
        SortedIntersectCountExpr(arrLit(sa.toSeq.sorted), arrLit(sb.toSeq.sorted))
          .eval(null).asInstanceOf[Int] == (sa & sb).size
    })
  }

  test("sorted-intersect elements equal the sorted set intersection, " +
      "and size agrees with the count expression") {
    check("isect-elems")(Prop.forAll(Gen.listOf(anyLong), Gen.listOf(anyLong)) {
      (xs, ys) =>
        val (sa, sb) = (xs.toSet, ys.toSet)
        val got = SortedIntersectExpr(arrLit(sa.toSeq.sorted), arrLit(sb.toSeq.sorted))
          .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
        got == (sa & sb).toSeq.sorted && got.size ==
          SortedIntersectCountExpr(arrLit(sa.toSeq.sorted), arrLit(sb.toSeq.sorted))
            .eval(null).asInstanceOf[Int]
    })
  }

  test("tri-credits emits (x,|∩|),(y,|∩|) then (z,1) per intersection element") {
    check("tri-credits")(Prop.forAll(
      anyLong, anyLong, Gen.listOf(anyLong), Gen.listOf(anyLong)) {
      (x, y, xs, ys) =>
        val (sa, sb) = (xs.toSet, ys.toSet)
        val inter = (sa & sb).toSeq.sorted
        val got = TriCreditsExpr(Literal(x), Literal(y),
            arrLit(sa.toSeq.sorted), arrLit(sb.toSeq.sorted))
          .eval(null).asInstanceOf[ArrayData]
        val rows = (0 until got.numElements()).map { i =>
          val r = got.getStruct(i, 2); (r.getLong(0), r.getLong(1))
        }
        val want =
          if (inter.isEmpty) Seq.empty
          else Seq((x, inter.size.toLong), (y, inter.size.toLong)) ++
            inter.map(z => (z, 1L))
        rows == want
    })
  }

  // --- nearest centroid -------------------------------------------------
  test("nearest-centroid equals the brute-force argmin with (dist, cid) ties") {
    val gen = for {
      k <- Gen.choose(1, 5)
      dims <- Gen.choose(1, 4)
      cents <- Gen.listOfN(k, Gen.listOfN(dims, Gen.choose(-100L, 100L)))
      vec <- Gen.listOfN(dims, Gen.choose(-100L, 100L))
    } yield (cents.map(_.toArray).toArray, vec)
    check("centroid")(Prop.forAll(gen) { case (cents, vec) =>
      val row = NearestCentroidExpr(arrLit(vec), cents).eval(null)
        .asInstanceOf[InternalRow]
      val ref = cents.zipWithIndex.map { case (c, i) =>
        (c.zip(vec).map { case (ci, vi) => val d = ci - vi; d * d }.sum, i)
      }.min
      (row.getLong(0), row.getInt(1)) == ref
    })
  }

  // --- top run ----------------------------------------------------------
  test("toprun returns the smallest most-frequent element of a sorted array") {
    val smallStr = Gen.choose(1, 3)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    check("toprun")(Prop.forAll(Gen.nonEmptyListOf(smallStr)) { ws =>
      val row = TopRunExpr(Literal.create(ws.sorted, ArrayType(StringType)))
        .eval(null).asInstanceOf[InternalRow]
      val (w, c) = (row.getUTF8String(0).toString, row.getInt(1))
      val freq = ws.groupBy(identity).map { case (k, v) => (k, v.size) }
      val maxC = freq.values.max
      c == maxC && freq(w) == maxC &&
        w == freq.filter(_._2 == maxC).keys.min // first run in sorted order
    })
  }

  // --- cosine -----------------------------------------------------------
  test("cosine is bit-identical to the same-order double accumulation") {
    val gen = for {
      n <- Gen.choose(1, 8)
      a <- Gen.listOfN(n, Gen.choose(-50, 50).map(_.toFloat))
      b <- Gen.listOfN(n, Gen.choose(-50, 50).map(_.toFloat))
    } yield (a :+ 1.0f, b :+ 1.0f) // appended 1 => both norms nonzero
    def fLit(xs: Seq[Float]) = Literal.create(xs, ArrayType(FloatType, containsNull = false))
    check("cosine")(Prop.forAll(gen) { case (a, b) =>
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      a.zip(b).foreach { case (x, y) =>
        dot += x.toDouble * y.toDouble
        nx += x.toDouble * x.toDouble
        ny += y.toDouble * y.toDouble
      }
      CosineSimExpr(fLit(a), fLit(b)).eval(null).asInstanceOf[Double] ==
        dot / (math.sqrt(nx) * math.sqrt(ny))
    })
  }
}
