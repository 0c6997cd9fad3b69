package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Deterministic 64-bit hash expressions for reproducible sampling /
  * shuffling. splitmix64 needs wrap-around long multiplication, which
  * plain `Column` arithmetic can't express under ANSI semantics (overflow
  * would throw); as a native expression it is Java two's-complement
  * arithmetic in both interpreted and generated code, and stays inside
  * whole-stage codegen.
  */
object HashExprs {

  /** splitmix64 of a long column — bit-identical to `Aggs.mix64` (and to
    * the DuckDB HUGEINT replay used by the oracles).
    */
  case class Mix64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType

    protected override def nullSafeEval(x: Any): Any =
      Aggs.mix64(x.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.ext.Aggs.mix64($c)")

    override protected def withNewChildInternal(newChild: Expression): Mix64 =
      copy(child = newChild)

    override def prettyName: String = "mix64"
  }

  def mix64(c: Column): Column = Bridge.column(Mix64(Bridge.expression(c)))

  /** Deterministic uniform [0, 1) from a long id: the top 53 bits of
    * mix64 scaled by 2^-53 (the standard double-from-bits construction —
    * exactly representable, so engines agree bit-for-bit).
    */
  def uniform01(id: Column): Column = {
    import org.apache.spark.sql.functions.{lit, shiftrightunsigned}
    shiftrightunsigned(mix64(id), 11).cast("double") / lit(9007199254740992.0)
  }
}
