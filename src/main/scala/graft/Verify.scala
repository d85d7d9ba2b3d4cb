package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Dump each query's result to `outDir/<name>` as parquet. A failed
    * query must be LOUD: an absent output dir made the driver's
    * correctness file silently drop the row (r7: q_events_window
    * vanished instead of erroring). On exception we write
    * `<name>/_GRAFT_ERROR` with the message, so the driver's read of
    * the "parquet" dir fails → an `err` row, never absence.
    * Returns the names that failed. */
  def dump(spark: SparkSession,
           queries: Map[String, (SparkSession, String) => DataFrame],
           sfDir: String, outDir: String): List[String] = {
    new java.io.File(outDir).mkdirs()
    var failed = List.empty[String]
    queries.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // the query is materialized: release operator-scoped caches so
        // a 110-query session doesn't accumulate them (r9 VERDICT #5)
        CacheRegistry.releaseAll()
      } catch { case e: Throwable =>
        CacheRegistry.releaseAll()
        failed ::= name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        val dir = Paths.get(s"$outDir/$name")
        try {
          if (Files.exists(dir)) { // drop any partial parquet output
            import scala.jdk.CollectionConverters._
            Files.walk(dir).iterator().asScala.toSeq.reverse
              .foreach(Files.deleteIfExists)
          }
          Files.createDirectories(dir)
          Files.writeString(dir.resolve("_GRAFT_ERROR"),
            s"$name failed: ${e}\n")
        } catch { case w: Throwable =>
          System.err.println(s"[verify] could not write sentinel: $w") }
      }
    }
    failed
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet may carry TIMESTAMP(NANOS); read as long nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // local-iteration filter: SPARK_GRAFT_ONLY=q_a,q_b runs a subset
    // (unset for the driver -> full dump)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val failed = dump(spark,
      SparkEntry.queries.filter { case (name, _) => only.forall(_.contains(name)) },
      sfDir, outDir)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // exit 0 even on per-query failure: the sentinel dirs above are what
    // turn the driver's compare red (err rows); a nonzero exit could make
    // the driver drop the WHOLE correctness file, which is the silent
    // failure mode this guards against.
    if (failed.nonEmpty) System.err.println(
      s"[verify] ${failed.size} queries FAILED: ${failed.sorted.mkString(", ")}")
  }
}
