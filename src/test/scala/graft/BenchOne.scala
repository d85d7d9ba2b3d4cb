package graft

import org.apache.spark.sql.SparkSession

/** Isolated re-measure of individual bench queries (test scope): ONE
  * query set per JVM, warmed at sf0.001, then `reps` timed runs with
  * per-rep wall + GC-time deltas. This is the adjudication tool for
  * suite-level drift: the full `graft.Bench` session runs 60+ queries
  * in one JVM where heap pressure from earlier queries can triple a
  * later query's wall time; a fresh-JVM rerun separates "the operator
  * regressed" from "the session degraded".
  *
  * Usage: Test/runMain graft.BenchOne <q1,q2,...> <reps>
  * Appends one JSON line per query to SPARK_GRAFT_BENCH1_OUT (if set).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q_dedup_exact", "q_minhash_dedup", "q_diagnostics")
    val reps = if (args.length > 1) args(1).toInt else 2
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val out = new StringBuilder
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // JIT/codegen warmup on the tiny SF so rep 1 is steady-state
      if (warmDir.nonEmpty)
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      val walls = Array.ofDim[Double](reps)
      val gcs = Array.ofDim[Long](reps)
      for (r <- 0 until reps) {
        val g0 = gcMillis
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        walls(r) = (System.nanoTime() - t0) / 1e9
        gcs(r) = gcMillis - g0
        // release operator-scoped caches BETWEEN reps, exactly like
        // graft.Bench's loop — without this, a cache-registering query
        // pays its build once and every later rep rides warm, so the
        // isolated figure overstates the engine vs the artifact's
        // per-rep-released discipline
        CacheRegistry.releaseAll()
        println(f"[bench1] $name%-24s rep${r + 1} ${walls(r)}%8.2fs gc=${gcs(r)}ms")
      }
      val med = walls.sorted.apply(reps / 2)
      val json = s"""{"query":"$name","reps":${walls.toList.map(w => f"$w%.3f").mkString("[", ",", "]")},"gc_ms":${gcs.mkString("[", ",", "]")},"median":${f"$med%.3f"},"min":${f"${walls.min}%.3f"},"sf":"$dir"}"""
      println(json)
      out.append(json).append('\n')
    }
    sys.env.get("SPARK_GRAFT_BENCH1_OUT").foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        out.toString.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    spark.stop()
  }
}
