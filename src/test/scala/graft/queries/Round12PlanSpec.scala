package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-12 plan/footprint pins: the louvain memo's documented-threshold
  * discipline (collect below the row cap, spill to a parquet table above
  * it — the r11 verdict's one watch item) and the incremental-cluster
  * composition's plan shape.
  */
class Round12PlanSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("louvainMemoize collects below the threshold, spills to parquet " +
      "above it") {
    val labels = (1 to 100).map(i => (i.toLong, (i % 7).toLong))
      .toDF("node", "community")
    GraphQueries.louvainMemoize(spark, labels, maxRows = 1000) match {
      case Left((schema, rows)) =>
        assert(schema.fieldNames.toSeq == Seq("node", "community"))
        assert(rows.length == 100)
      case Right(p) => fail(s"under-threshold labeling spilled to $p")
    }
    GraphQueries.louvainMemoize(spark, labels, maxRows = 10) match {
      case Left(_) =>
        fail("over-threshold labeling must NOT collect to the driver")
      case Right(path) =>
        val back = spark.read.parquet(path)
          .as[(Long, Long)].collect().toSet
        assert(back == labels.as[(Long, Long)].collect().toSet,
          "spilled labeling must round-trip exactly")
    }
  }

  test("default louvain memo threshold stays node-table-sized") {
    assert(GraphQueries.louvainMemoMaxRows == 2000000L)
  }
}
