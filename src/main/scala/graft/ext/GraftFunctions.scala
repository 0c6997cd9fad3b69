package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration of the native expression kernels, so `spark.sql`
  * users get them too (not only the DataFrame API):
  *
  *   SELECT simhash64(text), word_shingle_hashes(text, 3), dot_product(a, b)
  *
  * Either call `register(spark)` on a live session, or configure
  * `spark.sql.extensions=graft.ext.GraftExtensions` and they are present
  * in every session of the cluster.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (identifier, info, builder) descriptors — the shape both
    * `FunctionRegistry.registerFunction` and
    * `SparkSessionExtensions.injectFunction` consume.
    */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq[(String, String, Seq[Expression] => Expression)](
      ("simhash64", "64-bit SimHash of a string",
        { args => SimHash64.SimHashExpr(args.head) }),
      ("word_shingle_hashes", "distinct word n-gram hashes of a string",
        { args => TextShingles.WordShingleHashes(args.head, intArg(args(1), "n")) }),
      ("dot_product", "dot product of two float/double arrays",
        { args => VectorExprs.DotProduct(args.head, args(1)) }),
      ("minhash_signature", "MinHash signature of a shingle-hash array",
        { args => MinHashSig.MinHashSignature(args.head, intArg(args(1), "num")) }))
      .map { case (name, usage, b) =>
        (FunctionIdentifier(name),
          new ExpressionInfo("graft.ext.GraftFunctions", name, usage), b)
      }

  /** Register into one session's function registry. */
  def register(spark: SparkSession): Unit = descriptors.foreach { case (id, info, b) =>
    spark.sessionState.functionRegistry.registerFunction(id, info, b)
  }
}

/** `spark.sql.extensions` entry point (cluster-wide injection). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(ext.injectFunction)
}
