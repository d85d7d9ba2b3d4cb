package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenization (the SentencePiece discipline — Kudo 2018,
  * arXiv:1804.10959) — the FOURTH tokenizer family, and the only
  * GLOBALLY OPTIMAL one: where BPE/WordPiece/greedy-subword commit to
  * local decisions (merge order, longest match), the unigram model
  * scores every piece with a probability and segments each word by
  * VITERBI — the minimum total cost over ALL segmentations, not the
  * first greedy one. The "ba" case separates the families: with
  * pieces {b:10, a:10, ba:100}, greedy longest-match takes `ba` (1
  * token), Viterbi takes `b`+`a` (cost 20 < 100, 2 tokens).
  *
  * EXACTNESS: piece costs are INTEGER-quantized negative log-probs
  * (round(-ln(p)·1e6) as BIGINT — the LangId quantization), fixed at
  * training time and committed with the vocab, so Viterbi runs in
  * exact integer arithmetic: path cost sums are associative and
  * engine-independent, and the DuckDB oracle replays the DP as a
  * recursive CTE over the same inlined (piece, cost) table with zero
  * float risk. Ties break to the FEWEST tokens (lexicographic
  * (cost, ntok) minimum — additive-monotone, so the DP computes it
  * exactly); a word no piece path covers folds to ONE [UNK] token
  * (the WordPiece convention).
  *
  * Scale shape: the counter is the codegen'd [[UnigramTokenCount]]
  * expression over the normalized word array — the model is a few
  * hundred interned (piece → cost) entries loaded from the classpath
  * once per executor JVM; the per-word DP is O(len · maxPieceLen²)
  * with two primitive arrays, inside whole-stage codegen.
  */
object UnigramLm {

  /** Classpath location of the committed model: one `piece\tcostQ`
    * line per piece (written by `graft.UnigramVocabGen` through the
    * distributed trainer). */
  val VocabResource = "/graft/unigram_vocab.tsv"

  /** The committed (piece → quantized cost) model. */
  lazy val model: Map[String, Long] = {
    val in = getClass.getResourceAsStream(VocabResource)
    require(in != null, s"model resource $VocabResource not on classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).map { l =>
        val t = l.split('\t')
        require(t.length == 2, s"malformed model line: $l")
        t(0) -> t(1).toLong
      }.toMap
    finally in.close()
  }

  private lazy val maxPieceLen: Int =
    if (model.isEmpty) 0 else model.keysIterator.map(_.length).max

  /** The model sorted by piece — for the SQL oracle's VALUES table. */
  def modelSorted: Seq[(String, Long)] = model.toSeq.sortBy(_._1)

  /** ONE Viterbi DP for both counting and piece extraction — the
    * (cost, ntok) tie-break exists in exactly one place, so the
    * `segmentPieces(w).length == segmentCount(w)` invariant the
    * trainer's E-step relies on can never drift. Fills `outT` (token
    * counts per position) and, when non-null, `bp` (best piece length
    * ending at each position — the counting path passes null and
    * skips the allocation); returns whether any segmentation covers
    * the word. */
  private def viterbi(word: String, pieces: Map[String, Long],
                      maxLen: Int, outT: Array[Int],
                      bp: Array[Int]): Boolean = {
    val n = word.length
    val INF = Long.MaxValue
    val dpc = new Array[Long](n + 1)
    var i = 1
    while (i <= n) { dpc(i) = INF; i += 1 }
    var pos = 1
    while (pos <= n) {
      var l = math.min(maxLen, pos)
      while (l >= 1) {
        val pc = dpc(pos - l)
        if (pc != INF) {
          pieces.get(word.substring(pos - l, pos)) match {
            case Some(c) =>
              val cand = pc + c
              val candT = outT(pos - l) + 1
              if (cand < dpc(pos) ||
                (cand == dpc(pos) && candT < outT(pos))) {
                dpc(pos) = cand
                outT(pos) = candT
                if (bp != null) bp(pos) = l
              }
            case None => ()
          }
        }
        l -= 1
      }
      pos += 1
    }
    dpc(n) != INF
  }

  /** Viterbi segment count of one word under `pieces`: minimum total
    * integer cost over all segmentations, ties to the fewest tokens;
    * 1 ([UNK]) when no segmentation covers the word; 0 for empty. */
  def segmentCount(word: String, pieces: Map[String, Long],
                   maxLen: Int): Int = {
    if (word.isEmpty) return 0
    val dpt = new Array[Int](word.length + 1)
    // bp = null: the counting path skips the backpointer allocation
    if (viterbi(word, pieces, maxLen, dpt, null)) dpt(word.length) else 1
  }

  /** [[segmentCount]] with backpointers: the Viterbi-best piece
    * sequence itself (empty for uncoverable words — the E-step skips
    * them; [[segmentCount]] reports those as 1 [UNK]). Shares the DP,
    * so `segmentPieces(w).length == segmentCount(w)` for every
    * coverable word by construction. */
  def segmentPieces(word: String, pieces: Map[String, Long],
                    maxLen: Int): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val dpt = new Array[Int](word.length + 1)
    val bp = new Array[Int](word.length + 1)
    if (!viterbi(word, pieces, maxLen, dpt, bp)) Seq.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var p = word.length
      while (p > 0) {
        out += word.substring(p - bp(p), p)
        p -= bp(p)
      }
      out.reverseIterator.toSeq
    }
  }

  /** Static counting kernel shared by [[UnigramTokenCount]]'s
    * interpreted and generated paths. */
  def countArray(arr: ArrayData): Long = {
    val m = model
    val ml = maxPieceLen
    var s = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i).toString
        if (w.nonEmpty) s += segmentCount(w, m, ml)
      }
      i += 1
    }
    s
  }

  /** Unigram token count of a text column (shared normalization
    * chain; empty/blank text counts 0). */
  def unigramTokenCount(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(UnigramTokenCount(
      ColumnShim.expression(TextFunctions.normalizedWords(c))))
  }

  /** Static piece-extraction kernel shared by
    * [[UnigramSegmentPieces]]'s interpreted and generated paths:
    * the Viterbi-best pieces of one word under an arbitrary (piece →
    * quantized cost) model. NULL/empty words and uncoverable words
    * yield an empty array (the trainer's E-step skips them). */
  def segmentArray(w: UTF8String, pieces: Map[String, Long],
                   maxLen: Int): ArrayData = {
    val s = if (w == null) "" else w.toString
    val parts = segmentPieces(s, pieces, maxLen)
    new GenericArrayData(
      parts.iterator.map(UTF8String.fromString).toArray[Any])
  }

  /** Column form of the trainer's E-step segmentation under an
    * IN-TRAINING model (r13 verdict ask #3): the same native
    * expression discipline as [[unigramTokenCount]], sharing the ONE
    * [[viterbi]] DP — training and application provably use the same
    * kernel, and the E-step plan is ScalaUDF-free. */
  def segmentPiecesCol(c: Column, model: Map[String, Long],
                       maxLen: Int): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(UnigramSegmentPieces(
      ColumnShim.expression(c), model, maxLen))
  }
}

/** Codegen'd Viterbi unigram token count over an `array<string>` of
  * normalized words (the SubwordCount pattern). NULL input counts 0. */
case class UnigramTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_count requires array<string> input, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else UnigramLm.countArray(v.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${childGen.code}
         |long ${ev.value} = ${childGen.isNull}
         |  ? 0L
         |  : graft.functions.UnigramLm.countArray(${childGen.value});
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramTokenCount =
    copy(child = newChild)
}

/** Codegen'd Viterbi piece extraction of one word under a model passed
  * AT CONSTRUCTION (the trainer's per-EM-round state, unlike
  * [[UnigramTokenCount]]'s committed classpath model). The model rides
  * as a codegen reference object — deserialized once per task, never
  * per row — and equality stays STRUCTURAL (`Map` and `Int` fields
  * only, no Array — the ApproxPqCosine lesson), so two expressions
  * over equal models `semanticEquals`. NULL input yields an empty
  * array; so does an uncoverable word (the E-step contract — counting
  * reports those as 1 [UNK], extraction skips them, see
  * [[UnigramLm.segmentPieces]]). */
case class UnigramSegmentPieces(child: Expression,
                                model: Map[String, Long], maxLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment requires string input, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any =
    UnigramLm.segmentArray(
      child.eval(input).asInstanceOf[UTF8String], model, maxLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("uniModel", model,
      "scala.collection.immutable.Map")
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  graft.functions.UnigramLm.segmentArray(
         |    ${childGen.isNull} ? null : ${childGen.value},
         |    $modelRef, $maxLen);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramSegmentPieces =
    copy(child = newChild)
}
