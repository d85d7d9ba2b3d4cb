package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe: streaming-minhash throughput vs batch size and state
  * partition count, to find where the micro-batch floor stops
  * dominating. Not part of the bench artifact. */
object StreamMinhashProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.shuffle.partitions", 4)
    // SPARK_GRAFT_STATE_STORE=rocksdb probes the RocksDB provider
    if (sys.env.get("SPARK_GRAFT_STATE_STORE").contains("rocksdb"))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val out = graft.streaming.DocStreams
      .streamingMinhashDupPairs(docs)
      .writeStream.format("memory").queryName("probe_minhash")
      .outputMode("append").start()
    var k = 0L
    for (b <- 1 to 10) {
      val batch = Array.tabulate(1000) { i =>
        val g = k + i
        val src = if (g % 16 == 15 && g >= 16) g - 16 else g
        (g, BenchStreaming.docText(src, 30))
      }
      k += 1000
      val t0 = System.nanoTime()
      stream.addData(batch.toIndexedSeq)
      out.processAllAvailable()
      val dt = (System.nanoTime() - t0) / 1e9
      val p = out.lastProgress
      println(f"[probe] batch$b wall=$dt%.2f progress=${p.json}")
    }
    out.stop()
    // batch-side cost of the SAME signature+banding expressions over
    // 1000 docs (no streaming machinery): isolates expression cost
    locally {
      import org.apache.spark.sql.functions._
      val data = (0L until 1000L).map(g => (g, BenchStreaming.docText(g, 30)))
      val df = data.toDF("doc_id", "text")
      df.cache().count()
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val sig = df.select(col("doc_id"),
          graft.functions.TextFunctions.normalizedWords(col("text")).as("w"))
          .select(col("doc_id"),
            graft.operators.Dedup.minhashSignature(col("w"), 3, 32).as("sig"))
        val n = sig.selectExpr("max(aggregate(sig, 0L, (a, x) -> a ^ x))").collect()
        println(f"[probe] batch-sig rep$r ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      df.unpersist()
    }
    spark.stop()
  }
}
