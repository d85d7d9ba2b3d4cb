package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial-skew measurement for the as-of join: its window
  * partitions are per KEY, so the documented worst case is one hot key
  * holding a large share of all rows (a bot user, a default id). Remap
  * 10% of sf1's million events onto ONE user and compare the
  * clicks-asof-views wall against the natural key distribution.
  *
  * Usage: Test/runMain graft.AsofSkewProbe [eventsDir]
  */
object AsofSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type"))
      .persist()
    println("events: " + ev.count())
    def run(tag: String, events: org.apache.spark.sql.DataFrame): Unit = {
      val clicks = events.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = events.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"),
          col("event_id").as("view_id"))
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val n = graft.operators.TemporalJoin.asofJoin(clicks, views,
          Seq("user_id"), "ts", "vts", Seq("view_id")).count()
        println(f"[asof-skew] $tag rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    }
    run("natural", ev)
    // hot key: 10% of ALL events collapse onto user -1
    val hot = ev.withColumn("user_id",
      when(col("event_id") % 10 === 0, lit(-1L)).otherwise(col("user_id")))
      .persist()
    hot.count()
    run("hot-10pct", hot)
    spark.stop()
  }
}
