package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace-token counter: one pass over the UTF-8 bytes, no
  * split-array allocation — bit-identical to
  * `size(split(trim(text), "\\s+"))` for EVERY input (the expression it
  * replaces via [[graft.RewriteTokenCount]]), including the fixture
  * oddities that equivalence demands:
  *
  *  - `trim` strips 0x20 ONLY (Spark's trim), so edge tabs/newlines
  *    survive and produce the leading/trailing empty split elements
  *    (Java `split` with limit -1 keeps trailing empties);
  *  - an empty (or all-space) string counts 1 — `split("")` is `[""]`;
  *  - `\s` is the Java regex class: exactly the six ASCII whitespace
  *    chars, so a byte-level scan is exact (UTF-8 continuation bytes
  *    can never collide with ASCII).
  *
  * Token counting sits under the text-quality/funnel/vocab family — at
  * 100 TB the per-row split array is pure garbage-collector pressure,
  * which is the point of the rewrite.
  */
object TokenCountKernel {

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D

  def count(s: UTF8String): Int = {
    val n = s.numBytes
    var i = 0
    var j = n - 1
    while (i < n && s.getByte(i) == 0x20) i += 1
    while (j >= i && s.getByte(j) == 0x20) j -= 1
    if (j < i) return 1 // trimmed-empty: split("") == [""]
    var count = 0
    var inRun = false
    var k = i
    while (k <= j) {
      if (!isWs(s.getByte(k))) {
        if (!inRun) { count += 1; inRun = true }
      } else inRun = false
      k += 1
    }
    // a leading/trailing regex match contributes an empty split element
    if (isWs(s.getByte(i))) count += 1
    if (isWs(s.getByte(j))) count += 1
    count
  }
}

object TokenCountExpr {

  case class TokenCount(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType

    protected override def nullSafeEval(x: Any): Any =
      TokenCountKernel.count(x.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.ext.TokenCountKernel.count($c)")

    override protected def withNewChildInternal(
        newChild: Expression): TokenCount = copy(child = newChild)

    override def prettyName: String = "token_count"
  }

  def token_count(c: Column): Column =
    Bridge.column(TokenCount(Bridge.expression(c)))
}
