package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for two-column data clustering — the
  * layout trick behind Delta/Iceberg OPTIMIZE ZORDER, absent from Spark
  * OSS: interleave the bits of two keys so a sort on the combined code
  * keeps BOTH dimensions local within every contiguous range. Files
  * written in Z-order get bounded min/max ranges on both columns, so
  * footer-stat skipping works for predicates on either (a single-column
  * sort gives perfect ranges on one and useless ones on the other).
  *
  * Built from plain bitwise Column ops (the classic parallel-bit-spread
  * with magic masks) — Catalyst codegens the whole expression; no UDF,
  * no custom Expression needed, and the identical arithmetic is
  * expressible in any SQL dialect (see Analytics' `zorder_code` oracle).
  */
object ZOrder {

  private val SpreadSteps = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 31 bits of a non-negative long so input bit i lands
    * at output bit 2i (even positions).
    */
  def spread(c: Column): Column =
    SpreadSteps.foldLeft(c.bitwiseAND(lit(0x7FFFFFFFL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 62-bit Morton code of two non-negative (31-bit) keys: x on even
    * bits, y on odd. Monotone within each quadrant at every power-of-two
    * granularity — the property that makes contiguous code ranges into
    * bounded rectangles.
    */
  def morton2(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** The same arithmetic as a raw Catalyst expression tree, for the
    * `graft_morton(x, y)` SQL registration (GraftFunctions): the
    * analyzer type-coerces the operands, so integral columns of any
    * width work from `spark.sql`.
    */
  def morton2Expr(x: org.apache.spark.sql.catalyst.expressions.Expression,
      y: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    def spreadE(e: Expression): Expression =
      SpreadSteps.foldLeft(BitwiseAnd(e, Literal(0x7FFFFFFFL)): Expression) {
        case (acc, (s, m)) =>
          BitwiseAnd(BitwiseOr(acc, ShiftLeft(acc, Literal(s))), Literal(m))
      }
    BitwiseOr(spreadE(x), ShiftLeft(spreadE(y), Literal(1)))
  }

  /** The same spread as SQL text (for oracles / other engines): decimal
    * literals, standard `&`/`|`/`<<` only.
    */
  def spreadSql(v: String): String =
    SpreadSteps.foldLeft(s"($v & 2147483647)") { case (x, (s, m)) =>
      s"((($x | ($x << $s)) & $m))"
    }

  def morton2Sql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"
}
