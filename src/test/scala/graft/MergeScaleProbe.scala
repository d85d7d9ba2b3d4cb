package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The r13-ask-#1 MERGES-SCALING measurement: per-merge cost of the
  * tokenizer trainer paths as the merge count grows.
  *
  *  - `legacy`  — the r12/r13 loop shape (reimplemented here verbatim
  *    for the comparison): ONE full pair-count shuffle + argmax sort +
  *    ONE full-table rewrite + localCheckpoint PER merge —
  *    O(merges × distinct-pretokens).
  *  - `dist`    — the incremental distributed path (driver-held count
  *    map updated by affected-rows-only deltas; only rows containing
  *    the winning pair are rewritten/checkpointed).
  *  - `local`   — the byte-gated driver fallback (where-used index,
  *    O(affected) per merge).
  *
  * All three must be BYTE-IDENTICAL (asserted here and in
  * TokenizerSpec); the probe's output is the time ledger quoted in
  * SCALING.md / COVERAGE.md.
  *
  * Usage: Test/runMain graft.MergeScaleProbe [corpusDir] [nMerges...]
  */
object MergeScaleProbe {

  /** The r13 trainer loop, kept verbatim as the measurement baseline
    * (operators/Tokenizer.scala@r13:106-147). */
  private def legacyTrainBpe(docs: DataFrame, textCol: String,
                             nMerges: Int): IndexedSeq[(String, String)] = {
    var words = docs
      .select(explode(graft.functions.ByteBpe
        .gpt2Pretokens(col(textCol))).as("pt"))
      .groupBy("pt").agg(count(lit(1)).as("cnt"))
      .select(
        expr("transform(sequence(1, length(pt)), i -> substring(pt, i, 1))")
          .as("syms"),
        col("cnt"))
      .localCheckpoint()
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(syms) - 2)," +
            " i -> struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"),
          col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        merges += ((a, b))
        val rend = concat(lit("\t"), array_join(col("syms"), "\t\t"),
          lit("\t"))
        val rep = org.apache.spark.sql.functions.replace(rend,
          lit("\t" + a + "\t\t" + b + "\t"), lit("\t" + a + b + "\t"))
        words = words
          .withColumn("__r", rep)
          .select(
            split(expr("substring(__r, 2, length(__r) - 2)"), "\t\t")
              .as("syms"),
            col("cnt"))
          .localCheckpoint()
        m += 1
      }
    }
    merges.result()
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val counts =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(128, 512)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // `rich` = TestCorpora.richTexts (the TokenizerSpec differential
    // corpus — deep merge counts with no early stop)
    val docs =
      if (dir == "rich") {
        import spark.implicits._
        TestCorpora.richTexts.toDF("text")
      } else spark.read.parquet(s"$dir/documents.parquet").select("text")
    docs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    val nDistinct = docs
      .select(explode(graft.functions.ByteBpe.gpt2Pretokens(col("text")))
        .as("pt")).distinct().count()
    println(s"[mergescale] corpus=$dir distinct_pretokens=$nDistinct")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    counts.foreach { n =>
      val (lg, tLegacy) = time(legacyTrainBpe(docs, "text", n))
      val (ds, tDist) = time {
        graft.operators.Tokenizer.trainBpe(docs, "text", n,
          localByteLimit = 0L)
      }
      val (lc, tLocal) = time {
        graft.operators.Tokenizer.trainBpe(docs, "text", n,
          localByteLimit = Long.MaxValue)
      }
      require(lg == ds && ds == lc,
        s"path divergence at nMerges=$n: legacy=${lg.size} dist=${ds.size} " +
          s"local=${lc.size}, first diff at " +
          lg.zip(ds).indexWhere(p => p._1 != p._2) + "/" +
          ds.zip(lc).indexWhere(p => p._1 != p._2))
      println(f"[mergescale] nMerges=$n merges=${ds.size} " +
        f"legacy=${tLegacy}%.1fs dist=${tDist}%.1fs local=${tLocal}%.2fs " +
        f"legacy_per_merge=${tLegacy / ds.size}%.3fs " +
        f"dist_per_merge=${tDist / ds.size}%.3fs")
    }
    spark.stop()
  }
}
