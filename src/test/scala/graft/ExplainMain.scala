package graft
import org.apache.spark.sql.SparkSession
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- sys.env.get("SPARK_GRAFT_EXPLAIN").map(_.split(",").toSeq).getOrElse(Seq("q_moments", "q_ann_cosine", "q_dedup_exact",
      "q_paragraph_dedup", "q_bm25", "q_incremental_dedup", "q_token_drift",
      "q_incremental_minhash", "q_exact_substr", "q_pseudo_ppl_5",
      "q_html_extract", "q_outlink_hosts", "q_click_attribution"))) {
      println(s"===== $q =====")
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      // surface scan + join lines only
      plan.split("\n").filter(l => l.contains("Scan parquet") || l.contains("ReadSchema") ||
        l.contains("PushedFilters") || l.contains("Join") || l.contains("Exchange") ||
        l.contains("WholeStageCodegen")).take(12).foreach(println)
    }
    spark.stop()
  }
}
