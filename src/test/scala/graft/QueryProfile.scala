package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-stage profile of one registered query: runs the query
  * `reps` times (first run discarded as warmup) with a listener that
  * records every stage's wall time, task time, shuffle bytes and input
  * bytes — the measurement §1 of the optimization guide asks for when
  * the UI is unavailable (headless box).
  *
  * Usage:
  *   /tmp/run_graft.sh graft.QueryProfile q_moore_lewis /root/testdata/sf0.1 2
  */
object QueryProfile {
  case class StageRow(id: Int, name: String, tasks: Int, wallMs: Long,
                      taskMs: Long, inputMB: Double, shufReadMB: Double,
                      shufWriteMB: Double)

  def main(args: Array[String]): Unit = {
    val qnames: Seq[String] =
      if (args(0) == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val compact = sys.env.get("SPARK_GRAFT_PROFILE_COMPACT").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = mutable.ArrayBuffer[StageRow]()
    var record = false
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = sc.stageInfo
          val wall = (for {a <- si.completionTime; b <- si.submissionTime}
            yield a - b).getOrElse(0L)
          val m = si.taskMetrics
          stages.synchronized {
            stages += StageRow(si.stageId,
              si.name.split("\n")(0).take(90), si.numTasks, wall,
              m.executorRunTime,
              m.inputMetrics.bytesRead / 1e6,
              m.shuffleReadMetrics.totalBytesRead / 1e6,
              m.shuffleWriteMetrics.bytesWritten / 1e6)
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    for (qname <- qnames) {
      val fn = SparkEntry.queries(qname)
      // warmup on sf0.001 like the bench
      try { fn(spark, "/root/testdata/sf0.001").count() }
      catch { case _: Throwable => () }
      finally CacheRegistry.releaseAll()

      for (rep <- 1 to reps) {
        stages.clear()
        record = true
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        record = false
        CacheRegistry.releaseAll()
        Thread.sleep(300) // let the listener bus drain
        val rows = stages.sortBy(-_.wallMs)
        val sumWall = rows.map(_.wallMs).sum
        if (compact) {
          // one line per rep: wall, stage count, stage-wall sum, driver
          // gap, plus the single-task stages burning real CPU (the
          // §2.5 input-skew signature) — rep 1 is often codegen-cold,
          // read rep 2+
          val oneTask = rows.filter(r => r.tasks == 1 && r.taskMs > 250)
            .map(r => s"${r.id}:${r.taskMs}ms")
          println(f"$qname%-34s rep$rep wall=${dt}%6.2fs stages=${rows.size}%3d " +
            f"stageWall=${sumWall / 1000.0}%6.2fs gap=${dt - sumWall / 1000.0}%6.2fs " +
            f"oneTaskHot=[${oneTask.mkString(",")}]")
        } else {
          println(f"===== $qname rep$rep: $dt%.2f s, $n rows =====")
          println(f"${"stage"}%6s ${"wall_ms"}%8s ${"task_ms"}%8s ${"tasks"}%6s " +
            f"${"in_MB"}%8s ${"sh_r_MB"}%8s ${"sh_w_MB"}%8s  name")
          rows.take(25).foreach { r =>
            println(f"${r.id}%6d ${r.wallMs}%8d ${r.taskMs}%8d ${r.tasks}%6d " +
              f"${r.inputMB}%8.1f ${r.shufReadMB}%8.1f ${r.shufWriteMB}%8.1f  ${r.name}")
          }
          println(f"stages=${rows.size} sum_stage_wall=${sumWall}ms " +
            f"(query wall ${dt * 1000}%.0f ms; gap = driver/plan/launch time)")
        }
      }
    }
    spark.stop()
  }
}
