package graft.sources

import org.apache.spark.sql.DataFrame

/** Text/columnar source-format round-trips (SRC1 family, SURVEY §2.1):
  * the engine's tables are parquet-first, but a complete source layer
  * must also ingest CSV, JSON-lines, and ORC.
  *
  * Reads always pass an EXPLICIT schema: schema inference is a second
  * full scan of the data (and a nondeterministic contract) — at 100 TB
  * the schema is metadata, never derived from the bytes. Writes go
  * through the normal distributed writer (one file per partition, no
  * driver funnel).
  */
object Formats {

  def roundTripCsv(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").option("header", "true").csv(path)
    df.sparkSession.read.schema(df.schema).option("header", "true").csv(path)
  }

  def roundTripJson(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").json(path)
    df.sparkSession.read.schema(df.schema).json(path)
  }

  def roundTripOrc(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").orc(path)
    df.sparkSession.read.orc(path)
  }
}
