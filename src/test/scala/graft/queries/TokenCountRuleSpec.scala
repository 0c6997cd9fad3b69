package graft.queries

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** The TokenCount kernel + optimizer rule: bit-equality with the
  * split-based idiom on adversarial inputs, rewrite presence in the
  * optimized plan, and no rewrite for non-matching shapes. The rule is
  * attached via `experimental.extraOptimizations` — the live-session
  * registration path (a fresh JVM uses
  * `spark.sql.extensions=graft.GraftExtensions`, which injects the same
  * rule; `getOrCreate` in a shared test JVM cannot re-apply extensions)
  * — and detached after the suite so every other spec sees the
  * rule-free plans the Verify gate runs.
  */
class TokenCountRuleSpec extends AnyFunSuite with SparkTest
    with BeforeAndAfterAll {

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.experimental.extraOptimizations = Seq(graft.RewriteTokenCount)
  }

  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations = Nil
    super.afterAll()
  }

  import spark.implicits._

  private val edgeCases = Seq(
    "", " ", "  ", "\t", "\t\t", "a", " a ", "a b", "  a  b  ",
    "\ta b", "a b\t", "\ta b\t", "a\nb", "\n", " \t ", "a b",
    "word", "a  \t \n b", "\r\n", "x   y", "ü ö", "中 文 词")

  test("kernel == size(split(trim(x))) on edge cases and random strings") {
    val rnd = new Random(7)
    val alphabet = " \t\n\f\rab é中"
    val randoms = (0 until 2000).map { _ =>
      (0 until rnd.nextInt(30)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val df = (edgeCases ++ randoms).toDF("text")
    val bad = df.select(
        size(split(trim(col("text")), "\\s+")).as("idiom"),
        graft.ext.TokenCountExpr.token_count(col("text")).as("kernel"))
      .where(col("idiom") =!= col("kernel"))
    assert(bad.count() == 0L, bad.collect().mkString("\n"))
  }

  test("kernel preserves nulls") {
    val got = Seq(Some("a b"), None).toDF("text")
      .select(graft.ext.TokenCountExpr.token_count(col("text")))
      .as[Option[Int]].collect().toSet
    assert(got == Set(Some(2), None))
  }

  test("the optimizer rewrites the idiom (parquet scan, not foldable)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(size(split(trim(col("text")), "\\s+")).as("n"))
    assert(df.queryExecution.optimizedPlan.toString.contains("token_count"),
      df.queryExecution.optimizedPlan.toString)
    // and the rewritten plan computes the same counts as the raw idiom
    val raw = docs.select(
      graft.ext.TokenCountExpr.token_count(col("text")).as("n"))
    assert(df.as[Int].collect().sorted.toSeq ==
      raw.as[Int].collect().sorted.toSeq)
  }

  test("non-matching shapes are left alone") {
    // different pattern, different limit, no trim: all must keep split
    val df1 = Seq("a,b").toDF("t").select(size(split(trim(col("t")), ",")))
    val df2 = Seq("a b").toDF("t").select(size(split(col("t"), "\\s+")))
    assert(!df1.queryExecution.optimizedPlan.toString.contains("token_count"))
    assert(!df2.queryExecution.optimizedPlan.toString.contains("token_count"))
  }

  test("legacy sizeOfNull mode is NOT rewritten (size would return -1, kernel null)") {
    val prev = spark.conf.get("spark.sql.legacy.sizeOfNull", "false")
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    // ANSI (default-on in Spark 4) masks the legacy flag — the reachable
    // legacy regime is ansi=false + legacy=true
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val df = docs.select(size(split(trim(col("text")), "\\s+")).as("n"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("token_count"),
        "legacy-mode Size must keep the split form: " +
          df.queryExecution.optimizedPlan.toString)
      // and the legacy semantics survive on a null input
      val legacy = Seq[String](null).toDF("t")
        .select(size(split(trim(col("t")), "\\s+")).as("n"))
      assert(legacy.head().getInt(0) == -1)
    } finally {
      spark.conf.set("spark.sql.legacy.sizeOfNull", prev)
      spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
    }
  }

  test("SQL surface: the rewrite fires through spark.sql too") {
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("tcr_docs")
    val df = spark.sql(
      "SELECT size(split(trim(text), '\\\\s+')) AS n FROM tcr_docs")
    assert(df.queryExecution.optimizedPlan.toString.contains("token_count"),
      df.queryExecution.optimizedPlan.toString)
    assert(df.agg(sum(col("n"))).head().getLong(0) > 0L)
  }
}
