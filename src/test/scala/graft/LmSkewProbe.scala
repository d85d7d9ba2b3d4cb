package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial-skew measurement for the n-gram LM gates: plant one
  * 30-word boilerplate prefix on 10% of the sf0.1 documents (every
  * boilerplate n-gram then has df = 500 of 5,000 docs) and time the
  * trigram and 5-gram gates against the unplanted corpus. The gates'
  * count groupBys are map-side combined (hot keys collapse in the
  * combiner), so the exposed surface is the class-scoring join, whose
  * hot-key partition holds df probe rows — linear volume, spillable
  * sort — not an occurrence-list window. Results -> SKEW.md. */
object LmSkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val boiler = (1 to 30).map(i => s"boiler$i").mkString(" ")
    val planted = docs.withColumn("text",
      when(pmod(col("doc_id"), lit(10)) === 0,
        concat(lit(boiler + " "), col("text"))).otherwise(col("text")))
    def time(tag: String)(f: => Long): Unit = for (r <- 1 to 3) {
      val t0 = System.nanoTime(); val n = f
      println(f"[lmskew] $tag%-28s rep$r ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    val lm = graft.operators.LanguageModel
    for ((tag, d) <- Seq("plain" -> docs, "boiler10pct" -> planted)) {
      time(s"trigram/$tag") {
        val n = lm.trigramPseudoPerplexity(d, "doc_id", "text",
          parallelism = 32).count()
        CacheRegistry.releaseAll(); n }
      time(s"5gram/$tag") {
        val n = lm.ngramPseudoPerplexity(d, "doc_id", "text", 5,
          parallelism = 32).count()
        CacheRegistry.releaseAll(); n }
    }
    spark.stop()
  }
}
