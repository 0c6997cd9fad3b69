package graft.cardano

import java.nio.file.Files
import java.sql.{DriverManager, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** SRC1 live-ingress: the JDBC source mode against an embedded Derby
  * database (the in-sandbox stand-in for cardano-db-sync Postgres; Derby
  * ships with Spark). Pins:
  *  - the per-period time predicate lands in the pushed JDBC query;
  *  - reads are split into id-range partitions;
  *  - a JDBC-backed sync produces tables identical to the parquet path.
  */
class JdbcSourceSpec extends AnyFunSuite with SparkTest {

  /** Derby DDL type for a declared source field. Reserved words (`time`,
    * `key`, `view`) are quoted lowercase — exactly how they exist in the
    * real cardano-db-sync schema.
    */
  private def derbyType(dt: DataType): String = dt match {
    case LongType         => "BIGINT"
    case IntegerType      => "INTEGER"
    case TimestampType    => "TIMESTAMP"
    case StringType       => "VARCHAR(32000)"
    case BinaryType       => "VARCHAR(64) FOR BIT DATA"
    case d: DecimalType   => s"DECIMAL(${d.precision},${d.scale})"
    case other            => fail(s"unmapped type $other")
  }

  private val reserved = Set("time", "key", "view")
  private def q(name: String): String =
    if (reserved(name)) "\"" + name + "\"" else name

  /** Load the parquet fixture into Derby. Tables whose declared schema has
    * no `id` get a synthetic serial one (like the real tables have) — the
    * aligned read must prune it.
    */
  private def loadDerby(url: String, parquetDir: String): Unit = {
    val conn = DriverManager.getConnection(url + ";create=true")
    try {
      val st = conn.createStatement()
      for ((name, schema) <- Schemas.sourceTables) {
        val hasId = schema.fieldNames.contains("id")
        val idCol = if (hasId) "" else "id BIGINT NOT NULL, "
        val cols = schema.fields
          .map(f => s"${q(f.name)} ${derbyType(f.dataType)}").mkString(", ")
        st.execute(s"CREATE TABLE $name ($idCol$cols)")

        val rows = spark.read.schema(schema)
          .parquet(s"$parquetDir/$name.parquet").collect()
        val holes = schema.fields.indices.map(_ => "?")
          .mkString(if (hasId) "" else "?, ", ", ", "")
        val ps = conn.prepareStatement(s"INSERT INTO $name VALUES ($holes)")
        rows.zipWithIndex.foreach { case (r, ri) =>
          val off = if (hasId) 0 else 1
          if (!hasId) ps.setLong(1, ri + 1L)
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            val v = if (r.isNullAt(i)) null else r.get(i)
            (f.dataType, v) match {
              case (_, null)            => ps.setObject(i + 1 + off, null)
              case (BinaryType, b)      => ps.setBytes(i + 1 + off, b.asInstanceOf[Array[Byte]])
              case (TimestampType, t)   => ps.setTimestamp(i + 1 + off, t.asInstanceOf[Timestamp])
              case (d: DecimalType, x)  => ps.setBigDecimal(i + 1 + off, x.asInstanceOf[java.math.BigDecimal])
              case (_, x)               => ps.setObject(i + 1 + off, x)
            }
          }
          ps.executeUpdate()
        }
        ps.close()
      }
      st.close()
    } finally conn.close()
  }

  private lazy val parquetDir: String = {
    val dir = Files.createTempDirectory("jdbc-fixture-parquet").toString
    Fixture.write(spark, dir)
    dir
  }

  private lazy val derbyUrl: String = {
    val url = "jdbc:derby:memory:cardanosrc"
    loadDerby(url, parquetDir)
    url
  }

  test("declared schema is enforced on the JDBC read (names, types, pruning)") {
    for ((name, schema) <- Schemas.sourceTables) {
      val df = MainQuery.sourceTable(spark, derbyUrl, name)
      assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"schema mismatch on $name")
    }
  }

  test("per-period time predicate is pushed into the remote JDBC query") {
    val from = Timestamp.valueOf("2021-03-02 10:00:00")
    val to   = Timestamp.valueOf("2021-03-02 14:00:00")
    val df = MainQuery.sourceTable(spark, derbyUrl, "block")
      .where(col("time") > lit(from) && col("time") <= lit(to))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("JDBCRelation"), plan)
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThan(time"), s"time lower bound not pushed:\n$plan")
    assert(plan.contains("LessThanOrEqual(time"), s"time upper bound not pushed:\n$plan")
    // and the pushed read returns exactly the period's blocks
    // (10:30, 11:30, 13:47, 13:48 — the 10:00 boundary is exclusive)
    assert(df.count() == 4)
  }

  test("full extract over JDBC: the period predicate still reaches the block relation") {
    val records = MainQuery.extract(spark, derbyUrl,
      Timestamp.valueOf("2021-03-02 10:00:00"),
      Timestamp.valueOf("2021-03-02 14:00:00"))
    records.collect() // finalize AQE
    val plan = records.queryExecution.executedPlan.toString
    // the (from, to] filter must sit inside the block JDBC scan, pushed
    // through the branch projections and joins — not as a post-join filter
    assert(plan.contains("JDBCRelation(block)"), plan)
    assert(plan.contains("GreaterThan(time"), s"lower bound not pushed:\n$plan")
    assert(plan.contains("LessThanOrEqual(time"), s"upper bound not pushed:\n$plan")
  }

  test("reads are split into id-range partitions; a no-id table falls back to 1") {
    spark.conf.set(JdbcSource.NumPartitionsConf, "3")
    try {
      val block = MainQuery.sourceTable(spark, derbyUrl, "block")
      assert(block.rdd.getNumPartitions == 3)
      // every row exactly once across the splits
      assert(block.select("id").as[Long](spark.implicits.newLongEncoder)
        .collect().sorted.toSeq == (100L to 111L))
      // the synthetic split key exists remotely for ma_tx_out, so it splits
      // too — and is pruned from the aligned schema
      val mto = MainQuery.sourceTable(spark, derbyUrl, "ma_tx_out")
      assert(mto.rdd.getNumPartitions == 3)
      assert(!mto.columns.contains("id"))
    } finally spark.conf.unset(JdbcSource.NumPartitionsConf)
  }

  test("a 100k-row remote table splits into balanced, complete id ranges") {
    val url = "jdbc:derby:memory:bigsrc"
    val conn = DriverManager.getConnection(url + ";create=true")
    try {
      conn.createStatement().execute("CREATE TABLE big (id BIGINT NOT NULL, v BIGINT)")
      conn.setAutoCommit(false)
      val ps = conn.prepareStatement("INSERT INTO big VALUES (?, ?)")
      (0L until 100000L).foreach { i =>
        ps.setLong(1, i); ps.setLong(2, i * 7); ps.addBatch()
        if (i % 10000 == 9999) ps.executeBatch()
      }
      ps.executeBatch(); conn.commit(); ps.close()
    } finally conn.close()

    spark.conf.set(JdbcSource.NumPartitionsConf, "8")
    try {
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", LongType, nullable = true)))
      val df = JdbcSource.table(spark, url, "big", schema)
      assert(df.rdd.getNumPartitions == 8)
      val perPart = df.rdd
        .mapPartitions(it => Iterator.single(it.size.toLong)).collect().sorted
      assert(perPart.sum == 100000L)
      // dense serial ids -> uniform ranges: no partition more than 2% off
      assert(perPart.head >= 12250 && perPart.last <= 12750,
        s"unbalanced splits: ${perPart.mkString(",")}")
    } finally spark.conf.unset(JdbcSource.NumPartitionsConf)
  }

  test("JDBC-backed sync produces tables identical to the parquet path") {
    val jdbcStore = new TableStore(spark,
      Files.createTempDirectory("jdbc-sync-out").toString)
    val parquetStore = new TableStore(spark,
      Files.createTempDirectory("parquet-sync-out").toString)

    val nJdbc = new SyncDriver(spark, derbyUrl, jdbcStore, 120).catchUp()
    val nParq = new SyncDriver(spark, parquetDir, parquetStore, 120).catchUp()
    assert(nJdbc == nParq && nJdbc > 0)

    for (t <- Seq("wallet", "collection", "asset", "asset_tx",
        "asset_mint_tx", "asset_ext"))
      assert(
        jdbcStore.read(t).collect().map(_.toSeq.map(String.valueOf))
          .sortBy(_.mkString).toSeq ==
        parquetStore.read(t).collect().map(_.toSeq.map(String.valueOf))
          .sortBy(_.mkString).toSeq,
        s"table $t diverged between JDBC and parquet ingress")
  }

  test("empty remote table: tip probe is None, catch-up is a no-op") {
    val url = "jdbc:derby:memory:emptysrc"
    val conn = DriverManager.getConnection(url + ";create=true")
    try {
      val st = conn.createStatement()
      for ((name, schema) <- Schemas.sourceTables) {
        val hasId = schema.fieldNames.contains("id")
        val idCol = if (hasId) "" else "id BIGINT NOT NULL, "
        val cols = schema.fields
          .map(f => s"${q(f.name)} ${derbyType(f.dataType)}").mkString(", ")
        st.execute(s"CREATE TABLE $name ($idCol$cols)")
      }
      st.close()
    } finally conn.close()
    val store = new TableStore(spark,
      Files.createTempDirectory("jdbc-empty-out").toString)
    val drv = new SyncDriver(spark, url, store, 120)
    assert(drv.cardanoTip().isEmpty)
    assert(drv.catchUp() == 0)
  }
}
