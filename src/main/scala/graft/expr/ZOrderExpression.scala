package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression computing the Morton (z-order) interleave of
  * two 16-bit keys — the space-filling-curve clustering primitive behind
  * multi-dimensional data skipping: sorting/range-partitioning a table by
  * `z = interleave(x, y)` keeps rows that are close in BOTH dimensions in
  * the same file, so min/max pruning works for predicates on either column
  * (the technique behind z-order table layout in modern lakehouse formats).
  *
  * Inputs are masked to their low 16 bits (callers bucket wider keys
  * first); the result therefore fits in 32 bits and is always
  * non-negative, which keeps the DuckDB twin in safe BIGINT shift
  * territory. The bit-spreading uses the standard public magic-mask
  * sequence; `doGenCode` keeps it inside whole-stage codegen as straight
  * long ALU ops — no boxing, no function-call overhead per row.
  */
case class ZOrder16(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Bridge.AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder16.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("zx")
      val y = ctx.freshName("zy")
      def spread(v: String): String =
        s"""$v = ($v | ($v << 8)) & 0x00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;""".stripMargin
      s"""
         |long $x = $a & 0xFFFFL;
         |long $y = $b & 0xFFFFL;
         |${spread(x)}
         |${spread(y)}
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder16 {
  def interleave(xa: Long, ya: Long): Long = {
    var x = xa & 0xFFFFL
    var y = ya & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    y = (y | (y << 8)) & 0x00FF00FFL
    y = (y | (y << 4)) & 0x0F0F0F0FL
    y = (y | (y << 2)) & 0x33333333L
    y = (y | (y << 1)) & 0x55555555L
    x | (y << 1)
  }

  /** Column-API entry point. */
  def zorder(a: Column, b: Column): Column =
    Bridge.column(ZOrder16(Bridge.expression(a), Bridge.expression(b)))

  /** DuckDB twin: the identical mask-and-shift sequence in BIGINT
    * arithmetic (all intermediates < 2^33, far from overflow). */
  def sql(xe: String, ye: String): String = {
    def spread(e: String): String = {
      val m16 = s"(($e) & 65535)"
      val s8  = s"(($m16 | ($m16 << 8)) & 16711935)"         // 0x00FF00FF
      val s4  = s"(($s8 | ($s8 << 4)) & 252645135)"          // 0x0F0F0F0F
      val s2  = s"(($s4 | ($s4 << 2)) & 858993459)"          // 0x33333333
      s"(($s2 | ($s2 << 1)) & 1431655765)"                   // 0x55555555
    }
    s"(${spread(xe)} | (${spread(ye)} << 1))"
  }
}
