package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev profiler (guide §1): run named SparkEntry queries to the noop sink
  * with a stage listener, print per-query job/stage/task counts and the
  * top stages by wall time with executor cpu/run/shuffle attribution.
  * Usage: runMain graft.tools.ProfileQ <sfDir> <query> [query ...]
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(id: Int, name: String, tasks: Int, wallMs: Long,
                  runMs: Long, cpuMs: Long, shrB: Long, shwB: Long,
                  inB: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          val si = sc.stageInfo
          val m = si.taskMetrics
          val wall = (for {a <- si.submissionTime; b <- si.completionTime}
            yield b - a).getOrElse(0L)
          stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(80),
            si.numTasks, wall, m.executorRunTime,
            m.executorCpuTime / 1000000, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      stages.clear(); jobs = 0
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      graft.CacheScope.drain()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // let the listener bus drain
      val totTasks = stages.map(_.tasks).sum
      val totRun = stages.map(_.runMs).sum / 1e3
      val totCpu = stages.map(_.cpuMs).sum / 1e3
      println(f"\n[profq] $n  wall=$wall%.2fs jobs=$jobs stages=${stages.size} tasks=$totTasks execRun=$totRun%.1fs execCpu=$totCpu%.1fs")
      stages.sortBy(-_.wallMs).take(14).foreach { s =>
        println(f"[profq]   stage ${s.id}%4d ${s.name}%-80s tasks=${s.tasks}%4d wall=${s.wallMs / 1e3}%6.2fs run=${s.runMs / 1e3}%6.2fs cpu=${s.cpuMs / 1e3}%6.2fs in=${s.inB / 1024}%8dK shr=${s.shrB / 1024}%6dK shw=${s.shwB / 1024}%6dK")
      }
    }
    spark.stop()
  }
}
