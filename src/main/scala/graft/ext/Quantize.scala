package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-vector affine int8 quantization of embedding columns — the
  * standard 4× storage/shuffle compression for 100 TB-scale vector
  * corpora (store int8 + (min, scale) per vector; search dequantizes on
  * the fly or runs integer dot products).
  *
  * Everything is a narrow per-row projection of higher-order functions
  * (codegen'd, no UDF, no shuffle): q[i] = round((x[i] - min) / scale) -
  * 128 with scale = (max - min) / 255; constant vectors quantize to 0
  * with scale 1 so dequantization is exact.
  */
object Quantize {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** (.. idCol, qv array<int>, mn double, scale double). */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = asDouble(col(vecCol))
    DataOps.parallelismFloor(df.select(col(idCol), v.as("__v")))
      .withColumn("mn", array_min(col("__v")))
      .withColumn("scale",
        when(array_max(col("__v")) > col("mn"),
          (array_max(col("__v")) - col("mn")) / lit(255.0)).otherwise(lit(1.0)))
      .select(col(idCol),
        transform(col("__v"),
          x => (round((x - col("mn")) / col("scale"), 0) - lit(128)).cast("int")).as("qv"),
        col("mn"), col("scale"))
  }

  /** Inverse map: x̂[i] = (q[i] + 128) * scale + mn. */
  def dequantize(qv: Column, mn: Column, scale: Column): Column =
    transform(qv, q => (q.cast("double") + lit(128.0)) * scale + mn)

  /** Quantization fidelity per vector: cosine(original, dequantized). */
  def fidelity(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = int8(df, idCol, vecCol)
    val orig = df.select(col(idCol), asDouble(col(vecCol)).as("v"))
    orig.join(q, Seq(idCol))
      .withColumn("vhat", dequantize(col("qv"), col("mn"), col("scale")))
      .withColumn("cos_fidelity",
        VectorExprs.dot_product(col("v"), col("vhat")) /
          (sqrt(VectorExprs.dot_product(col("v"), col("v"))) *
            sqrt(VectorExprs.dot_product(col("vhat"), col("vhat")))))
      .select(col(idCol), col("cos_fidelity"))
  }
}
