package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over a shingle-hash array as a native expression:
  * one pass over the input, zero intermediate arrays.
  *
  * The permutation family is splitmix64-based:
  * `perm_s(h) = mix64(h XOR mix64(s))` for s = 1..num — the per-seed
  * constants `mix64(s)` are computed once per row, only the cheap final
  * mix runs per (shingle, permutation). Bit-for-bit identical to the
  * composed formulation `transform(sequence(1, num), s -> array_min(
  * transform(sh, x -> mix64(x XOR mix64(s)))))` (`Dedup.minhashSignature`)
  * AND to the DuckDB HUGEINT replay used by the `dedup_minhash` oracle —
  * splitmix64 is chosen over Spark's xxhash64 precisely because both sides
  * can reproduce it exactly. The composed form materializes `num` arrays
  * per row (the shingle set re-hashed per permutation); this kernel is the
  * minhash analogue of `TextShingles` (PERFORMANCE.md lesson 3).
  */
object MinHashSig {

  /** Empty input (null text upstream) mirrors `array_min` of an empty
    * array: a signature of `num` nulls.
    */
  def compute(arr: ArrayData, num: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](num))
    val ms = new Array[Long](num)
    var s = 0
    while (s < num) { ms(s) = Aggs.mix64((s + 1).toLong); s += 1 }
    val out = new Array[Long](num)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var k = 0
      while (k < num) {
        val p = Aggs.mix64(h ^ ms(k))
        if (p < out(k)) out(k) = p
        k += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  case class MinHashSignature(child: Expression, num: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData], num)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.ext.MinHashSig.compute($c, $num)")
    override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
      copy(child = newChild)
    override def prettyName: String = "minhash_signature"
  }

  def minhash_signature(shingleHashes: Column, num: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingleHashes), num))
}
