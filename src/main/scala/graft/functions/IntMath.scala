package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `gcd(a, b)` — ClickHouse's integer greatest common divisor, absent
  * from Spark's function library. Contract: the result is NON-NEGATIVE
  * (Euclid on absolute values), `gcd(0, 0) = 0`, and `abs(Long.MinValue)`
  * — which has no 64-bit representation — is a loud ArithmeticException
  * rather than a silent wrap (the engine's ANSI posture). The zero
  * handling is a DELIBERATE RELAXATION of ClickHouse, not a doc gap:
  * ClickHouse's gcd/lcm kernel runs its division-by-zero FPE check on
  * both arguments and THROWS when either is 0; this engine returns the
  * mathematical convention (gcd(x,0)=|x|, lcm(x,0)=0) instead of erroring
  * — a migrating query gets values where ClickHouse raised. (The same
  * stated relaxation applies to `isIPAddressInRange`, which returns false
  * on a malformed address where ClickHouse throws.) Codegen emits a
  * static call.
  */
case class Gcd(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    IntMath.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IntMath.gcd($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Gcd =
    copy(left = newLeft, right = newRight)
}

/** `lcm(a, b)` — least common multiple on the [[Gcd]] kernel:
  * `|a / gcd(a,b) * b|`, with `lcm(x, 0) = lcm(0, x) = 0` and overflow a
  * loud ArithmeticException (ClickHouse wraps C++-style; silent wrap
  * would be a wrong number, so the ANSI-loud lane is stated).
  */
case class Lcm(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    IntMath.lcm(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IntMath.lcm($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Lcm =
    copy(left = newLeft, right = newRight)
}

object IntMath {

  private def absExact(x: Long): Long = {
    if (x == Long.MinValue)
      throw new ArithmeticException(
        "gcd/lcm: abs(-9223372036854775808) overflows Int64")
    math.abs(x)
  }

  def gcd(a0: Long, b0: Long): Long = {
    var a = absExact(a0)
    var b = absExact(b0)
    while (b != 0L) {
      val t = a % b
      a = b
      b = t
    }
    a
  }

  def lcm(a: Long, b: Long): Long = {
    if (a == 0L || b == 0L) return 0L
    val g = gcd(a, b)
    // a/g is exact; the multiply is the overflow point — loud, never
    // wrapped (absExact also catches a product of exactly -2^63, whose
    // magnitude has no Int64 representation).
    absExact(java.lang.Math.multiplyExact(a / g, b))
  }
}
