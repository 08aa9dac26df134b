package graft.tools

import graft.operators.{Pipeline, Star, StarPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: phase-by-phase wall times of the incremental DAG gate
  * (the largest bench entry) — runs the same work as
  * q_pipeline_incremental but with a stopwatch between phases.
  */
object ProfilePipeline {
  import Profile.time

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wh = "/root/repo/target/scratch/profile_inc_wh"
    for (round <- 1 to 2) {
      Pipeline.reset(wh)
      val subset = col("l_orderkey") % 2 === 0
      time(s"r$round run1 (subset)")(
        Pipeline.runIncremental(spark, sfDir, wh, Some(subset)))
      time(s"r$round run2 (full)")(
        Pipeline.runIncremental(spark, sfDir, wh))
      // audit phases, mirroring the query body
      val subFlat = StarPipeline.flatFact(spark, sfDir).filter(subset)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"r$round subFlat persist")(subFlat.count())
      val fact = spark.read.parquet(s"$wh/star_fact")
      val nullFkAggs = StarPipeline.dimSpecs.map { case (n, _) =>
        sum(when(col(n + "_id").isNull, 1).otherwise(0)).cast("long").as(s"nf_$n")
      }
      time(s"r$round nullFk pass")(
        fact.agg(nullFkAggs.head, nullFkAggs.tail: _*).collect())
      val dimRows = StarPipeline.dimSpecs.map { case (n, keys) =>
        val dim = spark.read.parquet(s"$wh/$n")
        val freshSub = Star.buildDim(subFlat, keys, "__rid")
        val cond = keys.map(k => dim(k) <=> freshSub(k)).reduce(_ && _) &&
          dim(n + "_id") === freshSub("__rid")
        val stable = dim.join(freshSub, cond)
          .agg(count(lit(1)).as("stable_old_ids"))
        dim.agg(count(lit(1)).as("cnt")).crossJoin(stable)
          .select(lit(n).as("table_name"), col("cnt"), col("stable_old_ids"))
      }.reduce(_ unionByName _)
      time(s"r$round dim audit")(dimRows.collect())
      subFlat.unpersist()
    }
    spark.stop()
  }
}
