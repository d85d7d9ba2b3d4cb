package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` output for a list of registered queries
  * to files — the optimization-round plan evidence
  * (`plans/r16/<query>_{before,after}.txt`).
  *
  * Usage:
  *   SPARK_GRAFT_EXPLAIN=q_a,q_b \
  *     /tmp/run_graft.sh graft.PlanDump /root/testdata/sf0.1 plans/r16 before
  *
  * Writes one `<outDir>/<query>_<tag>.txt` per query with the formatted
  * physical plan (the optimizer's final static plan; AQE reshaping is
  * noted in OPTIMIZATION_r16.md where it matters). Queries that throw
  * get an `ERROR` file so a bad name never passes silently.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "plans/r16"
    val tag = if (args.length > 2) args(2) else "before"
    val names = sys.env.get("SPARK_GRAFT_EXPLAIN")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (q <- names) {
      val path = java.nio.file.Paths.get(outDir, s"${q}_$tag.txt")
      try {
        val df = SparkEntry.queries(q)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(path, plan.getBytes("UTF-8"))
        println(s"[plandump] $q -> $path")
      } catch {
        case e: Throwable =>
          java.nio.file.Files.write(path,
            s"ERROR building plan for $q: $e\n".getBytes("UTF-8"))
          println(s"[plandump] $q FAILED: $e")
      } finally CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
