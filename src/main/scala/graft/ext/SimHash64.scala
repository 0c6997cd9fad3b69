package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of whitespace-tokenized text, as a native Catalyst
  * expression with codegen (the preference order of SURVEY §7: built-ins >
  * custom Expression > UDF — this is the hot per-row kernel of simhash
  * dedup, so it gets the Expression treatment: no Scala-object
  * serialization per row, stays inside whole-stage codegen).
  *
  * Algorithm (Charikar, public): each token's 64-bit hash votes ±1 per bit;
  * the signature's bit i is 1 iff the vote sum is positive. Token hash is
  * xxHash64-compatible via Spark's own hashing (we reuse UTF8String
  * hashing through Murmur3-ish `hashCode` is NOT stable across JVMs, so we
  * use an explicit FNV-1a 64 over the token bytes — deterministic
  * everywhere).
  */
object SimHash64 {

  /** Deterministic 64-bit FNV-1a over a byte slice. */
  def fnv1a64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Token-vote SimHash over whitespace-separated tokens. Static so that
    * generated code can call it directly.
    */
  def compute(s: UTF8String): Long = {
    if (s == null) return 0L
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var i = 0
    var tokenStart = -1
    while (i <= bytes.length) {
      val isSpace = i == bytes.length ||
        bytes(i) == ' ' || bytes(i) == '\t' || bytes(i) == '\n' || bytes(i) == '\r'
      if (isSpace) {
        if (tokenStart >= 0) {
          val h = fnv1a64(bytes, tokenStart, i)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
          tokenStart = -1
        }
      } else if (tokenStart < 0) tokenStart = i
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  case class SimHashExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.ext.SimHash64.compute($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
      copy(child = newChild)
    override def prettyName: String = "simhash64"
  }

  def simhash64(c: Column): Column =
    Bridge.column(SimHashExpr(Bridge.expression(c)))
}
