package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Luhn mod-10 checksum validation (ISO/IEC 7812-1 — the check-digit
  * scheme of payment-card PANs), exposed as a native Catalyst expression
  * so card-number auditing stays inside whole-stage codegen alongside
  * the PII regex chain (no UDF boxing in the scrub path).
  */
object Luhn {

  /** Payment-card PAN lengths (ISO/IEC 7812-1). */
  final val MinDigits = 13
  final val MaxDigits = 19

  /** True iff `s` is a 13-19 char all-digit string whose Luhn checksum
    * is 0: walking from the RIGHTMOST digit, every second digit
    * (positions 2, 4, ... from the right) is doubled, doubles > 9 drop
    * 9, and the total must be divisible by 10. Non-digit characters or
    * out-of-range lengths return false (callers strip separators first).
    */
  def isValid(s: UTF8String): Boolean = {
    val t = s.toString
    val n = t.length
    if (n < MinDigits || n > MaxDigits) return false
    var sum = 0
    var i = n - 1
    var second = false
    while (i >= 0) {
      val c = t.charAt(i)
      if (c < '0' || c > '9') return false
      var d = c - '0'
      if (second) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      second = !second
      i -= 1
    }
    sum % 10 == 0
  }
}

/** `luhn_valid(digits)`: true iff the string is a 13-19 digit run
  * passing the Luhn mod-10 check.
  */
case class LuhnValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(input: Any): Any =
    Luhn.isValid(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Luhn.isValid($c)")
  override protected def withNewChildInternal(newChild: Expression): LuhnValid =
    copy(child = newChild)
}
