package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up at the smallest SF: compiles/JITs every query's codegen
    // and interpreted-expression paths once, so the timed loop below
    // measures steady-state throughput instead of first-query JIT cost
    // (the alphabetically-early heavy queries were paying 5-20x).
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    // local-iteration filter, same contract as Verify:
    // SPARK_GRAFT_ONLY=q_a,q_b times a subset (warmup included)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    if (warmDir.nonEmpty) {
      val t0 = System.nanoTime()
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .foreach { case (name, fn) =>
          try { fn(spark, warmDir).count() }
          catch { case _: Throwable => () }
          finally CacheRegistry.releaseAll()
        }
      System.err.println(
        f"[bench] warmup(${warmDir}) ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    // One timed run cannot tell a regression from a noisy neighbor (this
    // box showed 40x swings on unchanged code between rounds). Each query
    // runs `reps` times, round-robin across the whole suite so a
    // multi-minute contention spike hits at most one rep per query, and
    // the per-query figure is the MEDIAN (min/max kept for variance
    // visibility).
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val samples = scala.collection.mutable.Map(
      names.map(_ -> List.empty[Double]): _*)
    // per-rep GC-time delta (ms) alongside each wall time: when a whole
    // session drifts (r5->r6 showed a uniform 1.36x), the GC column is
    // what says "heap pressure" vs "the operator" without a re-run
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val gcSamples = scala.collection.mutable.Map(
      names.map(_ -> List.empty[Long]): _*)
    for (rep <- 1 to reps; name <- names) {
      val fn = SparkEntry.queries(name)
      val g0 = gcMillis
      val t0 = System.nanoTime()
      // a failed rep is recorded as -1, NEVER as the elapsed time: the
      // r7 bench logged q_events_window's 0.06s time-to-AnalysisException
      // as if it were a measurement.
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
                 false }
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      val gc = gcMillis - g0
      // each rep builds fresh operator-scoped caches (tokenDrift/LM/
      // rebalance register theirs); release outside the timed window so
      // a 3-rep x 110-query session doesn't accumulate them (r9 #5)
      CacheRegistry.releaseAll()
      System.err.println(f"[bench] $name%-22s rep$rep $dt%8.2fs gc=${gc}ms")
      samples(name) = samples(name) :+ dt
      gcSamples(name) = gcSamples(name) :+ gc
    }
    // aggregate over SUCCESSFUL reps only; a query whose reps all
    // failed reports -1 across median/min/max (an explicit sentinel,
    // not a plausible-looking wall time) and is excluded from `total`
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val results = names.map(n => (n, samples(n)))
    def fmt(f: List[Double] => Double) = results.map { case (k, xs) =>
      val ok = xs.filter(_ >= 0)
      s"\"" + k + "\":" + (if (ok.isEmpty) -1.0 else f(ok))
    }.mkString("{", ",", "}")
    val qs = fmt(median)
    val qmin = fmt(_.min)
    val qmax = fmt(_.max)
    val qreps = results.map { case (k, xs) =>
      s"\"" + k + "\":" + xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val qgc = names.map(n =>
      s"\"" + n + "\":" + gcSamples(n).mkString("[", ",", "]"))
      .mkString("{", ",", "}")
    val failedNames = results.collect {
      case (k, xs) if xs.forall(_ < 0) => k }
    val total = results.flatMap { case (_, xs) =>
      val ok = xs.filter(_ >= 0)
      if (ok.isEmpty) None else Some(median(ok))
    }.sum
    // dedup scaling curve (1x/3x/10x corpus, min of SCALING_REPS —
    // min is the spike-robust statistic for a log-log fit; a single
    // contention spike would otherwise bend the exponent): ~1 linear,
    // >1.2 flags a super-linear operator. Skippable for quick local
    // runs with SPARK_GRAFT_SCALING_REPS=0.
    val scalingReps = sys.env.getOrElse("SPARK_GRAFT_SCALING_REPS", "2").toInt
    val scalingJson = if (scalingReps <= 0) "{}" else {
      val curves = BenchScaling.run(spark, sfDir, Seq(1, 3, 10), scalingReps)
      curves.map { c =>
        val by = c.secByScale.map { case (k, t) => s""""${k}x":$t""" }
          .mkString(",")
        f""""${c.op}":{$by,"exponent":${c.exp}%.2f}"""
      }.mkString("{", ",", "}")
    }
    // streaming throughput (MemoryStream-driven, fixed batch plan);
    // skippable with SPARK_GRAFT_STREAM_BENCH=0
    val streamJson =
      if (sys.env.getOrElse("SPARK_GRAFT_STREAM_BENCH", "1") == "0") "{}"
      else BenchStreaming.run(spark).map { r =>
        s""""${r.name}":{${BenchStreaming.jsonFields(r)}}"""
      }.mkString("{", ",", "}")
    // isolated fresh-JVM re-measures (graft.BenchOne appends one JSON
    // line per query to bench_isolation.json) ride along so the round
    // artifact carries the session-drift adjudication data
    val isolationJson = {
      val p = java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH1_OUT", "/root/repo/bench_isolation.json"))
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.readAllLines(p).asScala
          .filter(_.trim.nonEmpty).mkString("[", ",", "]")
      } else "[]"
    }
    // non-dedup 10x scale point (graft.BenchScale10 writes it; rides
    // along like the isolation data)
    val scale10Json = {
      val p = java.nio.file.Paths.get("/root/repo/scaling_nondedup.json")
      if (java.nio.file.Files.exists(p))
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim
      else "{}"
    }
    val failedJson = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_min":$qmin,"queries_max":$qmax,"queries_reps":$qreps,"queries_gc_ms":$qgc,"failed_queries":$failedJson,"reps":$reps,"sf":"$sfDir","dedup_scaling":$scalingJson,"nondedup_scaling":$scale10Json,"streaming":$streamJson,"isolation":$isolationJson}"""
    // BENCH_r07-r09 all recorded "parsed": null. Two verified causes:
    // the driver keeps only the LAST 2000 CHARS of stdout (BENCH_r09
    // "tail" is exactly 2000), and sbt's logger wraps forked output in
    // "[info] " (fixed via run/outputStrategy in build.sbt). So the
    // marker pair now wraps ONE COMPACT line — summary stats + the
    // top-expensive per-query medians/mins, sized well under the tail
    // window — printed LAST so truncation can't reach it. The full
    // JSON still goes to stdout (GRAFT_BENCH_FULL prefix, for humans)
    // and to bench_out.json (the machine-complete committed artifact).
    val minSum = results.flatMap { case (_, xs) =>
      val ok = xs.filter(_ >= 0)
      if (ok.isEmpty) None else Some(ok.min)
    }.sum
    val topByMedian = results
      .map { case (k, xs) =>
        val ok = xs.filter(_ >= 0)
        (k, if (ok.isEmpty) -1.0 else median(ok),
          if (ok.isEmpty) -1.0 else ok.min)
      }
      .sortBy(-_._2).take(18)
    val topJson = topByMedian
      .map { case (k, md, _) => f""""$k":$md%.2f""" }.mkString("{", ",", "}")
    val topMinJson = topByMedian
      .map { case (k, _, mn) => f""""$k":$mn%.2f""" }.mkString("{", ",", "}")
    val compact = f"""{"metric":"total","value":$total%.1f,"unit":"sec","n_queries":${names.size},"median_sum":$total%.1f,"min_sum":$minSum%.1f,"queries":$topJson,"queries_min":$topMinJson,"failed_queries":$failedJson,"reps":$reps,"sf":"$sfDir","full":"bench_out.json"}"""
    println("GRAFT_BENCH_FULL " + json)
    println("GRAFT_BENCH_BEGIN")
    println(compact)
    println("GRAFT_BENCH_END")
    // stdout can be truncated by the harness (BENCH_r04 lost the first
    // ~12 query medians); the file is the machine-complete artifact
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: $e") }
    spark.stop()
  }
}
