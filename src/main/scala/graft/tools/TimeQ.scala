package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev timer: run named SparkEntry queries once, print wall seconds. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[timeq] $n%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$cnt")
    }
    spark.stop()
  }
}
