package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Per-batch attribution probe for the streaming MinHash pair path:
  * times every micro-batch under config/shape variants to locate the
  * fixed per-trigger cost. Throwaway diagnostics (test scope). */
object StreamProbe {
  private def docText(id: Long, wordsPerDoc: Int): String = {
    val sb = new StringBuilder
    var x = id * 0x9E3779B97F4A7C15L + 1
    var i = 0
    while (i < wordsPerDoc) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      sb.append("w").append(java.lang.Long.remainderUnsigned(x, 5000))
      sb.append(' ')
      i += 1
    }
    sb.toString
  }

  def runOne(spark: SparkSession, label: String, batches: Int,
             batchSize: Int, partitions: Int): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.shuffle.partitions", partitions)
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val piped = graft.streaming.DocStreams.streamingMinhashDupPairs(docs)
    val out = piped.writeStream.format("memory")
      .queryName(s"probe_$label").outputMode("append").start()
    try {
      var k = 0L
      val t0 = System.nanoTime()
      for (b <- 0 until batches) {
        val batch = Array.tabulate(batchSize) { i =>
          val g = k + i
          val src = if (g % 16 == 15 && g >= 16) g - 16 else g
          (g, docText(src, 30))
        }
        k += batchSize
        val tb = System.nanoTime()
        stream.addData(batch.toIndexedSeq)
        out.processAllAvailable()
        println(f"[probe] $label%-28s batch$b ${(System.nanoTime() - tb) / 1e9}%6.2fs")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-28s TOTAL ${batches * batchSize} rows ${dt}%6.2fs = ${batches * batchSize / dt}%.0f rows/s")
    } finally {
      out.stop()
      spark.sql(s"DROP TABLE IF EXISTS probe_$label")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    runOne(spark, "warm", 2, 50, 32)
    runOne(spark, "p32_1stage_x1", 10, 200, 32)
    runOne(spark, "p8_1stage_x1", 10, 200, 8)
    runOne(spark, "p8_1stage_big", 4, 500, 8)
    spark.stop()
  }
}
