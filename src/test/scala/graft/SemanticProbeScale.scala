package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the cell-bucketed semantic-index probe (r11
  * verdict ask #6, second half): a FIXED ingestion batch probed
  * against 1x and 10x corpus keeper tables, both persisted
  * `bucketBy(cell)` via [[Similarity.saveSemanticIndex]]. Because the
  * corpus side of the probe join reads hash-clustered from the files
  * and only batch-sized rows exchange, probe wall-clock should be
  * ~flat in corpus size (the 10x table scans more index rows per
  * probed cell, but moves none of them); the log-log exponent is the
  * committed number (SCALING.md).
  *
  * Timing discipline: MIN of reps per cell, caches released per rep —
  * the BenchScaling convention for two-point log-log fits.
  *
  * Usage: Test/runMain graft.SemanticProbeScale [n] [reps]
  */
object SemanticProbeScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic synthetic embeddings (hash-derived, executor-side)
    def vecs(count: Int, offset: Long) = spark.range(count)
      .select((col("id") + offset).as("vec_id"))
      .withColumn("embedding", array((0 until 16).map(j =>
        sin(col("vec_id") * (j + 1) * 0.7)): _*))
    val train = vecs(5000, 0)
    val model = Similarity.trainSemanticIndex(train, "vec_id", "embedding",
      nLists = 32, m = 4, nCodes = 16)
    val batch = vecs(2000, 10000000L)

    def buildTable(count: Int, name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      Similarity.saveSemanticIndex(
        Similarity.semanticSignatureIndex(model, vecs(count, 0),
          "vec_id", "embedding"), name, buckets = 32)
    }
    buildTable(n, "graft_semscale_1x")
    buildTable(n * 10, "graft_semscale_10x")

    // JIT warmup
    Similarity.incrementalSemanticFlags(model,
      spark.table("graft_semscale_1x"), batch, "vec_id", "embedding").count()
    CacheRegistry.releaseAll()

    val cells = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (rep <- 1 to reps; t <- Seq("graft_semscale_1x", "graft_semscale_10x")) {
      val t0 = System.nanoTime()
      Similarity.incrementalSemanticFlags(model, spark.table(t), batch,
        "vec_id", "embedding").count()
      val dt = (System.nanoTime() - t0) / 1e9
      CacheRegistry.releaseAll()
      System.err.println(f"[semscale] $t%-22s rep$rep $dt%8.2fs")
      cells(t) = cells(t) :+ dt
    }
    val t1 = cells("graft_semscale_1x").min
    val t10 = cells("graft_semscale_10x").min
    val exp = math.log(t10 / t1) / math.log(10.0)
    println(f"""{"op":"semantic_probe_bucketed","corpus_1x":$n,"batch":2000,"sec_1x":$t1%.2f,"sec_10x":$t10%.2f,"exponent":$exp%.2f}""")
    spark.sql("DROP TABLE IF EXISTS graft_semscale_1x")
    spark.sql("DROP TABLE IF EXISTS graft_semscale_10x")
    spark.stop()
  }
}
