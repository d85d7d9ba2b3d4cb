package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for q_lang_confusion_nb (test scope): where do the
  * seconds go — training counts, the pivot model build, scoring, or
  * the confusion rollup? */
object LangConfusionProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[probe] docs=${docs.count()}")
    for (round <- 1 to 2) {
      println(s"[probe] === round $round ===")
      val m = time("trainNb") {
        graft.operators.LangId.trainNb(docs, "text", "lang", 32)
      }
      time("model materialize") { m.model.count() }
      val pred = time("classify plan") {
        graft.operators.LangId.classify(docs, m, "doc_id", "text", 32)
      }
      time("classify count") { pred.count() }
      time("confusion") {
        docs.select(col("doc_id"), col("lang")).join(pred, "doc_id")
          .groupBy("lang", "lang_pred")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("lang", "lang_pred").count()
      }
      time("full query") {
        SparkEntry.queries("q_lang_confusion_nb")(spark, dir).count()
      }
      CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
