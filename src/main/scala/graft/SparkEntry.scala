package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, BboxSummary, Curation, Dedup, Evolution, Graph, Multimodal, Pipeline, Relational, Retrieval, Scd, Similarity, Sketches, SqlSurface, StarPipeline, TemporalJoins, TextAnalysis, Topics, Training}
import graft.sources.Sources
import graft.streaming.StreamOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY.md §2 ids in
  * the names); `oracleSql` carries the DuckDB-equivalent SQL for the
  * driver's correctness compare. Column aliases match between the two by
  * construction (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: the star-schema build (SURVEY §7.1 step 4) — dims via
    * distinct + deterministic surrogate keys, fact via broadcast left
    * joins. Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    StarPipeline.fact(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Sources.queries ++ Relational.queries ++ StarPipeline.queries ++
      Topics.queries ++ Analytics.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      StreamOps.queries ++ BboxSummary.queries ++ TemporalJoins.queries ++
      Pipeline.queries ++ Training.queries ++ Curation.queries ++ Scd.queries ++
      Sketches.queries ++ SqlSurface.queries ++ Retrieval.queries ++
      Evolution.queries ++ Graph.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for non-SQL-expressible ops
    * (driver then records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    Sources.oracles ++ Relational.oracles ++ StarPipeline.oracles ++
      Topics.oracles ++ Analytics.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Multimodal.oracles ++
      StreamOps.oracles ++ BboxSummary.oracles ++ TemporalJoins.oracles ++
      Pipeline.oracles ++ Training.oracles ++ Curation.oracles ++ Scd.oracles ++
      Sketches.oracles ++ SqlSurface.oracles ++ Retrieval.oracles ++
      Evolution.oracles ++ Graph.oracles
}
