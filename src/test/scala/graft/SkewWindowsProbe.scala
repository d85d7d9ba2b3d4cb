package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial-skew measurement for the posting-list operators (r9
  * VERDICT #4): plant one boilerplate paragraph / word-run on 10% of
  * the sf0.1 documents and time paragraphDedup + ngramNovelty in BOTH
  * formulations — the r9 window form (each fingerprint's whole
  * occurrence list lands in one sorted partition) and the r10
  * combiner form (first-owner = map-side-combined min; no posting
  * list ever colocates). Prints per-form walls + the hot key's
  * multiplicity; results go into SKEW.md.
  *
  * Usage: Test/runMain graft.SkewWindowsProbe [sfDir] [dupShare]
  */
object SkewWindowsProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val share = if (args.length > 1) args(1).toInt else 10 // 1-in-N docs
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val boiler = (1 to 30).map(i => s"boiler$i").mkString(" ")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % share === 0,
          concat(lit(boiler + " "), col("text"))).otherwise(col("text"))
          .as("text"))
    val paras = docs.select(col("doc_id"),
      graft.functions.TextFunctions.spanArray(col("text"), 30).as("paras"))
      .persist()
    paras.count()
    val hot = paras.select(explode(col("paras")).as("p"))
      .groupBy(graft.functions.TextFunctions.fingerprint(col("p")))
      .agg(count(lit(1)).as("c")).agg(max("c")).head.getLong(0)
    def time(tag: String)(f: => Long): Unit =
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[skewwin] $tag%-28s rep$r ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
      }
    val D = graft.operators.Dedup
    time("paragraphDedup(combiner)") {
      D.paragraphDedup(paras, "doc_id", "paras").count() }
    time("paragraphDedup(window)") {
      D.paragraphDedupWindowed(paras, "doc_id", "paras").count() }
    time("ngramNovelty(combiner)") {
      D.ngramNovelty(docs, "doc_id", "text", n = 5).count() }
    time("ngramNovelty(window)") {
      D.ngramNoveltyWindowed(docs, "doc_id", "text", n = 5).count() }
    println(s"[skewwin] hot-paragraph multiplicity=$hot of ${paras.count()} docs")
    spark.stop()
  }
}
