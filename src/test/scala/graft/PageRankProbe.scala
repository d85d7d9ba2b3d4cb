package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the q_host_pagerank pathology (27-314 s at
  * sf0.1 while q_host_degrees over the same edges runs 0.8 s): edge
  * derivation vs power iterations, per-iteration walls.
  *
  * Usage: Test/runMain graft.PageRankProbe [sfDir]
  */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.functions.{HtmlFunctions, UrlFunctions}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val page = col("doc_id") % 100
    val tgt1 = concat(lit("http://h"), page % 4,
      lit(".graft.example/docs/"), page)
    val tgt2 = when(col("doc_id") % 7 === 0,
      concat(lit("http://ads.bad.graft.test/banner/"), col("doc_id") % 10))
      .otherwise(concat(lit("https://MIRROR.h"), page % 4,
        lit(".graft.example:8443/alt")))
    val html = concat(
      lit("<html><body><nav><a href=\"/\">Home</a> " +
        "<a href='/about'>About</a></nav><p>see <a href=\""),
      tgt1, lit("\">first</a> and <a href='"), tgt2,
      lit("'>second</a> plus <a href=\"#frag\">anchor</a> " +
        "and <a>no href</a>.</p></body></html>"))
    val edges = docs
      .select(col("doc_id"),
        explode(HtmlFunctions.outlinks(html)).as("href"))
      .filter(col("href").rlike("^[A-Za-z][A-Za-z0-9+.-]*://"))
      .select(
        concat(lit("site"), col("doc_id") % 6, lit(".graft.example"))
          .as("src_host"),
        UrlFunctions.urlBareHost(col("href")).as("dst_host"))
    t("edges.count")(println("  edges: " + edges.count()))
    // inlined pageRank with per-phase timing
    val e = t("fold e")(edges
      .select(col("src_host").cast("string").as("src"),
        col("dst_host").cast("string").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .groupBy("src", "dst")
      .agg(count(lit(1)).cast("double").as("w")))
    val outW = e.groupBy("src").agg(sum("w").as("out_w"))
    val share = t("share persist+count") {
      val sh = e.join(outW, "src")
        .select(col("src"), col("dst"), (col("w") / col("out_w")).as("share"))
        .persist()
      sh.count(); sh
    }
    val nodes = t("nodes persist+count") {
      val n = e.select(col("src").as("host"))
        .union(e.select(col("dst").as("host"))).distinct().persist()
      n.count(); n
    }
    val srcs = nodes.select(col("host")).join(
      outW.select(col("src").as("host")), Seq("host"), "left_semi")
    val dangling = t("dangling persist+count") {
      val d = nodes.join(srcs, Seq("host"), "left_anti").persist()
      d.count(); d
    }
    val nDf = nodes.agg(count(lit(1)).cast("double").as("n"))
    var ranks = t("ranks0 localCheckpoint")(nodes.crossJoin(broadcast(nDf))
      .select(col("host"), (lit(1.0) / col("n")).as("rank"))
      .localCheckpoint())
    for (it <- 1 to 5) {
      val dMass = ranks.join(dangling, Seq("host"), "left_semi")
        .agg(coalesce(sum("rank"), lit(0.0)).as("d_mass"))
      val contribs = ranks.join(share, col("host") === col("src"))
        .groupBy("dst")
        .agg(sum(col("rank") * col("share")).as("contrib"))
      val next = t(s"iter $it next localCheckpoint") {
        nodes
          .join(contribs.withColumnRenamed("dst", "host"), Seq("host"), "left")
          .crossJoin(broadcast(nDf))
          .crossJoin(broadcast(dMass))
          .select(col("host"),
            (lit(0.15) / col("n") + lit(0.85) *
              (coalesce(col("contrib"), lit(0.0)) +
                col("d_mass") / col("n"))).as("rank"))
          .localCheckpoint()
      }
      ranks = next
    }
    println("  final mass: " + ranks.agg(sum("rank")).head().getDouble(0))
    spark.sharedState.cacheManager.clearCache()
    spark.stop()
  }
}
