package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for q_pseudo_ppl_5 at the bench's 4 cores. */
object Ppl5Probe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 4
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[ppl5] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    val lm = graft.operators.LanguageModel
    t("token frame (order 5)") {
      lm.tokenizeNgrams(docs, Some("doc_id"), "text", 5, 32).count()
    }
    for (r <- 1 to 3)
      t(s"full q_pseudo_ppl_5 rep$r") {
        val out = SparkEntry.queries("q_pseudo_ppl_5")(spark, dir).count()
        CacheRegistry.releaseAll(); out
      }
    spark.stop()
  }
}
