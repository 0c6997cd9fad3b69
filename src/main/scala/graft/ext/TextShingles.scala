package graft.ext

import java.util.{HashSet => JHashSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle *hashes* of lowercased text, as a native
  * expression: one pass over the bytes, no intermediate token/shingle
  * strings, no O(k²) array_distinct. Output is `array<long>` — downstream
  * MinHash/Jaccard work on 64-bit hashes (collision probability is
  * negligible at corpus scale and the shuffle carries 8-byte elements
  * instead of shingle strings).
  *
  * The composed-expression formulation (split → transform(slice+concat) →
  * array_distinct) measured ~1 ms/doc; this is the hot kernel of both
  * dedup families, hence the Expression treatment (same rationale as
  * SimHash64).
  */
object TextShingles {

  /** FNV-1a 64 over the lowercased bytes of `n` consecutive tokens
    * (separator byte 0x20 between tokens), distinct, ordered by first
    * appearance. Short texts (< n tokens) yield one hash of all tokens.
    */
  def compute(s: UTF8String, n: Int): ArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Long])
    val bytes = s.toLowerCase.getBytes
    // token boundaries
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    var inTok = false
    while (i <= bytes.length) {
      val isSpace = i == bytes.length ||
        bytes(i) == ' ' || bytes(i) == '\t' || bytes(i) == '\n' || bytes(i) == '\r'
      if (!isSpace && !inTok) { starts.add(i); inTok = true }
      if (isSpace && inTok) { ends.add(i); inTok = false }
      i += 1
    }
    val nTok = starts.size()
    val seen = new JHashSet[Long]()
    val out = new java.util.ArrayList[Long]()

    def hashRange(tokFrom: Int, tokUntil: Int): Long = {
      var h = 0xcbf29ce484222325L
      var t = tokFrom
      while (t < tokUntil) {
        if (t > tokFrom) { h ^= 0x20L; h *= 0x100000001b3L }
        var j = starts.get(t)
        val e = ends.get(t)
        while (j < e) {
          h ^= (bytes(j) & 0xffL); h *= 0x100000001b3L
          j += 1
        }
        t += 1
      }
      h
    }

    if (nTok < n) {
      val h = hashRange(0, nTok)
      if (seen.add(h)) out.add(h)
    } else {
      var t = 0
      while (t + n <= nTok) {
        val h = hashRange(t, t + n)
        if (seen.add(h)) out.add(h)
        t += 1
      }
    }
    val arr = new Array[Long](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }

  case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.ext.TextShingles.compute($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
      copy(child = newChild)
    override def prettyName: String = "word_shingle_hashes"
  }

  def word_shingle_hashes(text: Column, n: Int): Column =
    Bridge.column(WordShingleHashes(Bridge.expression(text), n))
}
