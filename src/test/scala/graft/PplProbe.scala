package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PplProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[ppl] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    import graft.functions.TextFunctions
    // piece 1: raw tokenize+explode+count
    t("explode+count") {
      docs.select(explode(TextFunctions.normalizedWords(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1))).count() }
    // piece 2: the trigram token frame (transform/sequence/struct)
    val w = split(TextFunctions.normalizeText(col("text")), " ")
    val pairs = transform(sequence(lit(0), size(w) - 1), i =>
      struct(i.as("pos"), element_at(w, i + 1).as("word"),
        when(i === 0, lit(null).cast("string"))
          .otherwise(element_at(w, i)).as("prev"),
        when(i <= 1, lit(null).cast("string"))
          .otherwise(element_at(w, i - 1)).as("prev2")))
    t("trigram token frame") {
      docs.select(col("doc_id"), explode(pairs).as("t")).count() }
    t("trigram token frame agg") {
      docs.select(col("doc_id"), explode(pairs).as("t"))
        .select(col("t.word").as("word")).groupBy("word")
        .agg(count(lit(1))).count() }
    for (r <- 1 to 2)
      t(s"full trigram rep$r") {
        val out = graft.operators.LanguageModel
          .trigramPseudoPerplexity(docs, "doc_id", "text").count()
        CacheRegistry.releaseAll(); out }
    for (r <- 1 to 2)
      t(s"full bigram rep$r") {
        val out = graft.operators.LanguageModel
          .bigramPseudoPerplexity(docs, "doc_id", "text").count()
        CacheRegistry.releaseAll(); out }
    spark.stop()
  }
}
