package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregation point for every query family exposed through SparkEntry. */
object Queries {
  type QueryFn = (SparkSession, String) => DataFrame

  def all: Map[String, QueryFn] =
    CoreQueries.all ++ ExtQueries.all ++ GraphQueries.all ++
      PipelineQueries.all ++ EvalQueries.all

  def oracles: Map[String, String] =
    CoreQueries.oracles ++ ExtQueries.oracles ++ GraphQueries.oracles ++
      PipelineQueries.oracles ++ EvalQueries.oracles
}
