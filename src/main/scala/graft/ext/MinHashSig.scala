package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over a shingle-hash array as a native expression:
  * one pass over the input, zero intermediate arrays.
  *
  * Bit-for-bit identical to the composed formulation
  * `transform(sequence(1, num), seed -> array_min(transform(sh, s ->
  * xxhash64(s, seed))))` — Spark's `xxhash64(a, b)` folds its arguments as
  * `hashLong(b, hashLong(a, 42))`, so per element the 42-seeded first fold
  * is computed once and only the cheap per-permutation fold runs `num`
  * times. The composed form materializes `num` arrays per row (the
  * shingle set re-hashed per permutation); this kernel is the minhash
  * analogue of `TextShingles` (PERFORMANCE.md lesson 3).
  */
object MinHashSig {

  /** Empty input (null text upstream) mirrors `array_min` of an empty
    * array: a signature of `num` nulls.
    */
  def compute(arr: ArrayData, num: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](num))
    val out = new Array[Long](num)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < n) {
      val h1 = XXH64.hashLong(arr.getLong(j), 42L)
      var s = 1
      while (s <= num) {
        // the permutation index comes from sequence(1, num) — IntegerType,
        // which Spark's xxhash64 folds via hashInt, not hashLong
        val h = XXH64.hashInt(s, h1)
        if (h < out(s - 1)) out(s - 1) = h
        s += 1
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
