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

  /** Legacy-loop depth cutoff: the r12/r13 baseline is
    * O(merges × table) with ~2 Spark jobs per merge — at 2048+ it
    * takes tens of minutes and measures nothing new (its per-merge
    * cost is flat by construction). The incremental paths run at
    * every requested depth. */
  private val LegacyMaxMerges = 512

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val counts =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(128, 512)
    // SPARK_GRAFT_PROBE_SHUFFLE widens the trainer's base partition
    // count (nPart follows the words-groupBy shuffle width) — the
    // r15 ask #4 production-shape run sets 256 to show candidate
    // partitions stay ~constant while total partitions grow
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_PROBE_SHUFFLE", "32").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // `rich` = TestCorpora.richTexts (the TokenizerSpec differential
    // corpus); `rich2` = TestCorpora.richTexts2 (the 2048-4096
    // fold-cadence octaves — richTexts exhausts first)
    val docs =
      if (dir == "rich") {
        import spark.implicits._
        TestCorpora.richTexts.toDF("text")
      } else if (dir == "rich2") {
        import spark.implicits._
        TestCorpora.richTexts2.toDF("text")
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
    val Tok = graft.operators.Tokenizer
    counts.foreach { n =>
      val legacyOpt =
        if (n <= LegacyMaxMerges) Some(time(legacyTrainBpe(docs, "text", n)))
        else None
      // skip-scan ledger: scanned vs total base partitions per merge
      val ledger = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      Tok.probeScanLedger = ledger
      val (ds, tDist) = time {
        Tok.trainBpe(docs, "text", n, localByteLimit = 0L)
      }
      Tok.probeScanLedger = null
      val (lc, tLocal) = time {
        Tok.trainBpe(docs, "text", n, localByteLimit = Long.MaxValue)
      }
      legacyOpt.foreach { case (lg, _) =>
        require(lg == ds,
          s"path divergence at nMerges=$n: legacy=${lg.size} dist=${ds.size}" +
            s", first diff at ${lg.zip(ds).indexWhere(p => p._1 != p._2)}")
      }
      require(ds == lc,
        s"path divergence at nMerges=$n: dist=${ds.size} local=${lc.size}" +
          s", first diff at ${ds.zip(lc).indexWhere(p => p._1 != p._2)}")
      // scan decay: mean scanned partitions over the first and last
      // 128 merges (the skip-scan's read-cost evidence)
      def meanScan(rows: Seq[(Int, Int)]): Double =
        if (rows.isEmpty) 0.0
        else rows.map(_._1).sum.toDouble / rows.size
      val head = ledger.take(128).toSeq
      val tail = ledger.takeRight(128).toSeq
      val nPartTot = ledger.headOption.map(_._2).getOrElse(0)
      val legacyStr = legacyOpt
        .map { case (_, t) =>
          f"legacy=${t}%.1fs legacy_per_merge=${t / ds.size}%.3fs " }
        .getOrElse("legacy=skipped ")
      println(f"[mergescale] nMerges=$n merges=${ds.size} " +
        legacyStr +
        f"dist=${tDist}%.1fs local=${tLocal}%.2fs " +
        f"dist_per_merge=${tDist / ds.size}%.3fs " +
        f"scan_parts_total=$nPartTot " +
        f"scan_parts_first128=${meanScan(head)}%.1f " +
        f"scan_parts_last128=${meanScan(tail)}%.1f")
    }

    // WordPiece argmax: ScoreArgmax heap vs the r14 O(live pairs)
    // scan, same build, byte-identity asserted — the r14 ask-#3
    // measured row (driver-local path isolates pure argmax cost).
    // One untimed call first: the first WordPiece train of the JVM
    // pays word-count job + JIT warmup that would otherwise land on
    // whichever variant runs first.
    Tok.trainWordPiece(docs, "text", 16, localByteLimit = Long.MaxValue)
    counts.filter(_ <= 1024).foreach { n =>
      val (wpHeap, tHeap) = time {
        Tok.trainWordPiece(docs, "text", n, localByteLimit = Long.MaxValue)
      }
      Tok.probeForceScanArgmax = true
      val (wpScan, tScan) =
        try time {
          Tok.trainWordPiece(docs, "text", n, localByteLimit = Long.MaxValue)
        } finally Tok.probeForceScanArgmax = false
      require(wpHeap == wpScan,
        s"wordpiece heap/scan divergence at nMerges=$n: " +
          s"${wpHeap.zip(wpScan).indexWhere(p => p._1 != p._2)}")
      println(f"[mergescale] wordpiece nMerges=$n merges=${wpHeap.size} " +
        f"heap=${tHeap}%.2fs scan=${tScan}%.2fs " +
        f"heap_per_merge=${tHeap / wpHeap.size * 1000}%.2fms " +
        f"scan_per_merge=${tScan / wpHeap.size * 1000}%.2fms")
    }
    spark.stop()
  }
}
