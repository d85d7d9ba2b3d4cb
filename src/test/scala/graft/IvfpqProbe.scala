package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-volume probe for IVFPQ (SKEW.md evidence): replays the
  * coarse assignment + probe lists of the q_ann_ivfpq config and counts
  * the scored (query, row) pairs vs the brute-force |Q|x|corpus|. */
object IvfpqProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val nLists = 8; val nProbe = 3
    // trainQuantizer is private[graft] — visible to this probe
    val centers = graft.operators.Similarity.trainQuantizer(
      e, "vec_id", "embedding", nLists)
    val bc = spark.sparkContext.broadcast(centers)
    val cells = e.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (_, v) =>
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < bc.value.length) {
          var s = 0.0; var j = 0
          val cc = bc.value(c)
          while (j < v.length) { val t = v(j) - cc(j); s += t * t; j += 1 }
          if (s < bd) { bd = s; best = c }
          c += 1
        }
        best
      }.groupByKey(identity).count().collect().toMap
    val qs = e.filter(col("vec_id") < 8)
      .select(col("embedding").cast("array<double>"))
      .as[Array[Double]].collect()
    val probesPerCell = new Array[Int](nLists)
    qs.foreach { q =>
      val d = centers.map { cc =>
        var s = 0.0; var j = 0
        while (j < q.length) { val t = q(j) - cc(j); s += t * t; j += 1 }
        s
      }
      d.zipWithIndex.sortBy(_._1).take(nProbe)
        .foreach { case (_, c) => probesPerCell(c) += 1 }
    }
    val scored = cells.map { case (c, rows) => rows * probesPerCell(c) }.sum
    val brute = n * qs.length
    println(s"[ivfpq] corpus=$n queries=${qs.length} nLists=$nLists nProbe=$nProbe")
    println(s"[ivfpq] cellSizes=${cells.toSeq.sortBy(_._1).map(_._2).mkString(",")}")
    println(s"[ivfpq] probesPerCell=${probesPerCell.mkString(",")}")
    println(f"[ivfpq] scoredPairs=$scored bruteForce=$brute ratio=${scored.toDouble / brute}%.3f expected=${nProbe.toDouble / nLists}%.3f")
    spark.stop()
  }
}
