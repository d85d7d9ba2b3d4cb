package graft.operators

/** Driver-only scaling probe for the WordPiece ARGMAX structures
  * (r15): the corpus-level probes measure parity at test scale
  * because the [a-z0-9] alphabet keeps live pairs ~10³ and nearly
  * every pair re-scores each merge (`affected ≈ live`). This probe
  * synthesizes the PRODUCTION regime the claim is about — live pairs
  * up to 10⁶ over thousands of symbols, each "merge" touching TWO
  * symbols — and times [[Tokenizer.ScoreArgmax]] (heap, re-pushed
  * through the symbol→pairs index) against
  * [[Tokenizer.likelihoodArgmax]] (the r14 O(live pairs) scan) on the
  * SAME evolving state, asserting they agree at every step.
  *
  * No SparkSession — pure driver data structures, which is the point:
  * at 50k merges the argmax is driver CPU, and this is the isolated
  * cost of exactly that.
  *
  * Usage: Test/runMain graft.operators.ArgmaxScaleProbe [steps]
  */
object ArgmaxScaleProbe {
  def main(args: Array[String]): Unit = {
    val steps = if (args.nonEmpty) args(0).toInt else 512
    Seq(10 * 1000, 100 * 1000, 1000 * 1000).foreach { targetPairs =>
      val rnd = new scala.util.Random(20260816L + targetPairs)
      val nSyms = math.max(64, math.sqrt(targetPairs.toDouble).toInt * 2)
      val syms = (0 until nSyms).map(i => s"s$i").toArray
      val pairCounts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symCounts = scala.collection.mutable.HashMap.empty[String, Long]
      syms.foreach(s => symCounts(s) = 1000L + rnd.nextInt(100000))
      while (pairCounts.size < targetPairs) {
        val p = (syms(rnd.nextInt(nSyms)), syms(rnd.nextInt(nSyms)))
        if (!pairCounts.contains(p))
          pairCounts(p) = 1L + rnd.nextInt(10000)
      }
      val keys = pairCounts.keys.toArray
      val sam = new Tokenizer.ScoreArgmax(pairCounts, symCounts)
      var heapNs = 0L
      var scanNs = 0L
      var step = 0
      while (step < steps) {
        // one "merge": the winner leaves, two symbols change count
        // (re-scoring every pair touching them), a few random pairs
        // move — exactly the trainer's delta shape
        val t0 = System.nanoTime()
        val h = sam.pop()
        heapNs += System.nanoTime() - t0
        val t1 = System.nanoTime()
        val sc = Tokenizer.likelihoodArgmax(pairCounts, symCounts)
        scanNs += System.nanoTime() - t1
        require(h == sc, s"argmax divergence at step $step: $h vs $sc")
        val chP = scala.collection.mutable.Set.empty[(String, String)]
        val chS = scala.collection.mutable.Set.empty[String]
        if (h != null) { pairCounts.remove(h); chP += h }
        (0 until 2).foreach { _ =>
          val s = syms(rnd.nextInt(nSyms))
          symCounts(s) = math.max(1L, symCounts(s) + rnd.nextInt(2001) - 1000)
          chS += s
        }
        (0 until 3).foreach { _ =>
          val k = keys(rnd.nextInt(keys.length))
          if (pairCounts.contains(k)) {
            pairCounts(k) = 1L + rnd.nextInt(10000)
            chP += k
          }
        }
        // the heap PAYS for its index maintenance + snapshot
        // re-pushes; the scan pays nothing here — charge noteChanged
        // to the heap's ledger so the comparison is total cost, not
        // just pop vs scan
        val t2 = System.nanoTime()
        sam.noteChanged(chP, chS)
        heapNs += System.nanoTime() - t2
        step += 1
      }
      println(f"[argmaxscale] live_pairs=$targetPairs%8d syms=$nSyms%6d " +
        f"steps=$steps heap_per_step=${heapNs / steps / 1000.0}%9.1fus " +
        f"scan_per_step=${scanNs / steps / 1000.0}%9.1fus " +
        f"speedup=${scanNs.toDouble / math.max(1L, heapNs)}%6.1fx")
    }
  }
}
