package graft.functions

import org.apache.spark.Partitioner
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** djb2 string hash with the exact semantics of the reference
  * partitioner (`/root/reference/mapreduce.c:154-160`):
  *
  * {{{
  *   unsigned long hash = 5381;
  *   int c;
  *   while ((c = *key++) != '\0') hash = hash * 33 + c;
  * }}}
  *
  * Notes for byte-exact parity:
  *   - `unsigned long` is 64-bit on the reference platform; Scala `Long`
  *     arithmetic wraps identically (two's complement == mod 2^64).
  *   - `c` is an `int` loaded from `char`, which is signed on x86 Linux:
  *     bytes >= 0x80 sign-extend to negative values before the add. We
  *     reproduce that by casting the byte to `Byte` (signed) then widening.
  *   - The final `% num_partitions` in C is an unsigned modulo →
  *     `java.lang.Long.remainderUnsigned`.
  */
object Djb2 {
  def hash(key: Array[Byte]): Long = {
    var h = 5381L
    var i = 0
    while (i < key.length) {
      h = h * 33 + key(i) // key(i): Byte, sign-extends like C's (int)(char)
      i += 1
    }
    h
  }

  def hash(key: String): Long = hash(key.getBytes("UTF-8"))

  /** Partition index exactly as the reference computes it. */
  def partition(key: String, numPartitions: Int): Int =
    java.lang.Long.remainderUnsigned(hash(key), numPartitions.toLong).toInt

  /** Column form, codegen'd (whole-stage-codegen friendly). */
  def djb2(c: Column): Column = Bridge.column(Djb2Hash(Bridge.expression(c)))

  /** `djb2(key) % p` as an unsigned modulo — the reference's partition id
    * (`mapreduce.c:159`: `hash % num_partitions` on an unsigned long).
    */
  def djb2Pid(c: Column, p: Int): Column =
    Bridge.column(Djb2Pid(Bridge.expression(c), p))
}

/** `Long.remainderUnsigned(djb2(key), p)` as one codegen'd expression. */
case class Djb2Pid(child: Expression, p: Int) extends UnaryExpression {
  require(p > 0)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.remainderUnsigned(
      Djb2.hash(input.asInstanceOf[UTF8String].getBytes), p.toLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("djb2Bytes")
      val i = ctx.freshName("djb2I")
      val h = ctx.freshName("djb2H")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 5381L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 33L + $bytes[$i];
         |}
         |${ev.value} = java.lang.Long.remainderUnsigned($h, ${p}L);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Djb2Pid =
    copy(child = newChild)
}

/** Native Catalyst expression for [[Djb2.hash]] with `doGenCode`, so the
  * hash stays inside whole-stage codegen (no UDF serialization, no boxing).
  */
case class Djb2Hash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Djb2.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("djb2Bytes")
      val i = ctx.freshName("djb2I")
      val h = ctx.freshName("djb2H")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 5381L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 33L + $bytes[$i];
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Djb2Hash =
    copy(child = newChild)
}

/** Unsigned UTF-8 lexicographic string ordering == C `strcmp` on the
  * reference's NUL-terminated UTF-8 keys (`mapreduce.c:123-141`). The JVM
  * default `Ordering[String]` compares UTF-16 code units, which diverges
  * from byte order for supplementary code points (surrogate pairs sort
  * before U+E000..U+FFFF in UTF-16 order but after in UTF-8 byte order).
  *
  * Allocation-free: this sits in the comparator hot path of
  * `repartitionAndSortWithinPartitions` (O(n log n) invocations), so it
  * walks chars instead of re-encoding both strings per call; at the
  * first differing char the standard surrogate remap recovers code-point
  * (== UTF-8 byte) order. Exact for all well-formed strings (Java's
  * UTF-8 encoder mangles unpaired surrogates to '?' anyway, so byte
  * parity is undefined for malformed input in either formulation).
  */
object Utf8ByteOrdering extends Ordering[String] {
  override def compare(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.charAt(i)
      val cb = b.charAt(i)
      if (ca != cb) {
        // plain char order == code-point order unless both chars are
        // >= U+D800: surrogates (U+D800-DFFF, representing >= U+10000)
        // must sort AFTER U+E000-FFFF
        if (ca >= 0xD800 && cb >= 0xD800) {
          val fa = if (ca >= 0xE000) ca - 0x800 else ca + 0x2000
          val fb = if (cb >= 0xE000) cb - 0x800 else cb + 0x2000
          return fa - fb
        }
        return ca - cb
      }
      i += 1
    }
    a.length - b.length
  }
}

/** RDD-level partitioner with the reference's exact partition layout
  * (`mapreduce.c:111-144`: partition = djb2(key) % P, unsigned).
  * Only needed when byte-exact partition-file parity matters
  * (`partitioned_wc`); everything else uses Spark's HashPartitioning.
  */
class Djb2Partitioner(val partitions: Int) extends Partitioner {
  require(partitions > 0)
  override def numPartitions: Int = partitions
  override def getPartition(key: Any): Int = key match {
    case null => 0
    case s: String => Djb2.partition(s, partitions)
    case other => Djb2.partition(other.toString, partitions)
  }
  override def equals(other: Any): Boolean = other match {
    case p: Djb2Partitioner => p.partitions == partitions
    case _ => false
  }
  override def hashCode: Int = partitions
}
