package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native dot product over two `array<double>` columns.
  *
  * The higher-order-function formulation
  * `aggregate(zip_with(a,b,_*_), 0d, _+_)` materializes an intermediate
  * array per row and blocks subexpression elimination inside lambdas; this
  * expression is a single fused loop in both interpreted and generated
  * code — the hot kernel of the similarity operators (millions of pairs).
  */
object VectorExprs {

  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double ${ev.value}Acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${ev.value}Acc += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = ${ev.value}Acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)

    override def prettyName: String = "dot_product"
  }

  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Fused random-hyperplane signature: bit b = sign(v · h_b) over `bits`
    * deterministic ±1 planes, all computed in ONE loop nest per row.
    *
    * The composed form (`bits` array Literals × when/bitwiseOR reduce)
    * produced an expression tree whose analysis + janino compile cost ~1 s
    * of driver time per LSH query and re-read the vector `bits` times per
    * row; this kernel reads it once. Bit-exact with the composed form: the
    * per-plane accumulation is the same ascending-dim IEEE fold
    * dot_product used, and the plane values use the identical
    * splitmix64-style (bit, dim) hash — which the DuckDB LSH oracle
    * replays (`annLshSql`).
    */
  case class RhpSignature(child: Expression, bits: Int, maxDim: Int)
      extends UnaryExpression {
    require(bits >= 1 && bits <= 64 && maxDim >= 1)
    override def dataType: DataType = LongType

    @transient private lazy val planes: Array[Array[Double]] =
      VectorExprs.rhpPlanes(bits, maxDim)

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), maxDim)
      var sig = 0L
      var b = 0
      while (b < bits) {
        val p = planes(b)
        var acc = 0.0
        var d = 0
        while (d < n) { acc += x.getDouble(d) * p(d); d += 1 }
        if (acc > 0.0) sig |= (1L << b)
        b += 1
      }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val tbl = ctx.addReferenceObj("rhpPlanes", planes, "double[][]")
        val n = ctx.freshName("n")
        val b = ctx.freshName("b")
        val d = ctx.freshName("d")
        val acc = ctx.freshName("acc")
        val p = ctx.freshName("p")
        val sig = ctx.freshName("sig")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $maxDim);
           |long $sig = 0L;
           |for (int $b = 0; $b < $bits; $b++) {
           |  double[] $p = $tbl[$b];
           |  double $acc = 0.0;
           |  for (int $d = 0; $d < $n; $d++) {
           |    $acc += $a.getDouble($d) * $p[$d];
           |  }
           |  if ($acc > 0.0) $sig |= (1L << $b);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): RhpSignature =
      copy(child = newChild)

    override def prettyName: String = "rhp_signature"
  }

  /** Fused Johnson–Lindenstrauss projection: all `k` output coordinates
    * of the ±1-sign projection in ONE loop nest per row, each coordinate
    * an exact scaled-long sum of round-at-6 terms (`Σ round6(vᵢ·±1)`),
    * emitted as `acc/1e6` doubles — bit-identical to the previous
    * DECIMAL(30,6)-fold SQL expression (exact integer sum, one correctly
    * rounded IEEE divide) and to the DuckDB oracle's
    * `CAST(sum(DECIMAL) AS DOUBLE)`. The SQL higher-order form
    * interpreted a k×dIn decimal lambda per row (the whole cost of the
    * `vec_project` bench entry); this kernel is the same arithmetic as
    * straight-line JVM code.
    */
  case class JlProject(child: Expression, k: Int, dIn: Int)
      extends UnaryExpression {
    require(k >= 1 && dIn >= 1)
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)

    @transient private lazy val signs: Array[Array[Double]] =
      Similarity.projectionSigns(dIn, k)

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), dIn)
      val out = new Array[Double](k)
      var d = 0
      while (d < k) {
        val sg = signs(d)
        var acc = 0L
        var i = 0
        while (i < n) {
          acc += Similarity.round6Scaled(x.getDouble(i) * sg(i))
          i += 1
        }
        out(d) = acc.toDouble / 1e6
        d += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val tbl = ctx.addReferenceObj("jlSigns", signs, "double[][]")
        val n = ctx.freshName("n")
        val d = ctx.freshName("d")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val sg = ctx.freshName("sg")
        val out = ctx.freshName("out")
        val t = ctx.freshName("t")
        val ab = ctx.freshName("ab")
        val fl = ctx.freshName("fl")
        val r = ctx.freshName("r")
        // the rounding below is Similarity.round6Scaled inlined verbatim —
        // half-away-from-zero on x*1e6, the engines' shared round(x, 6)
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $dIn);
           |double[] $out = new double[$k];
           |for (int $d = 0; $d < $k; $d++) {
           |  double[] $sg = $tbl[$d];
           |  long $acc = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $t = $a.getDouble($i) * $sg[$i] * 1.0E6;
           |    double $ab = java.lang.Math.abs($t);
           |    double $fl = java.lang.Math.floor($ab);
           |    double $r = ($ab - $fl >= 0.5) ? $fl + 1.0 : $fl;
           |    $acc += (long) ($t < 0 ? -$r : $r);
           |  }
           |  $out[$d] = ((double) $acc) / 1.0E6;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): JlProject =
      copy(child = newChild)

    override def prettyName: String = "jl_project"
  }

  def jl_project(vec: Column, k: Int, dIn: Int): Column =
    Bridge.column(JlProject(Bridge.expression(vec), k, dIn))

  /** The deterministic ±1 plane table (splitmix64-style hash of
    * (bit, dim) — replayed verbatim by the DuckDB LSH oracle). Cached per
    * (bits, maxDim); shared by interpreted and generated code.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  def rhpPlanes(bits: Int, maxDim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((bits, maxDim), { case (nb, nd) =>
      Array.tabulate(nb, nd) { (b, d) =>
        var h = b.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xC2B2AE3D27D4EB4FL
        h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
        if ((h & 1L) == 0L) 1.0 else -1.0
      }
    })

  def rhp_signature(vec: Column, bits: Int, maxDim: Int = 256): Column =
    Bridge.column(RhpSignature(Bridge.expression(vec), bits, maxDim))
}
