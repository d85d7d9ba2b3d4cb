package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** WordPiece tokenization (the BERT discipline — Schuster & Nakajima
  * 2012; the published greedy longest-match segmenter of the BERT
  * reference implementation, github.com/google-research/bert
  * tokenization.py) — the third tokenizer family next to the greedy
  * flat-vocab [[Subword]] and the byte-level merge-rank [[ByteBpe]].
  * What distinguishes it from both:
  *
  *  - CONTINUATION PIECES: a piece matching at word position > 0 must
  *    carry the `##` prefix in the vocab, and the same surface string
  *    can exist as both an initial and a continuation piece with
  *    independent statistics. [[Subword]]'s flat vocab cannot express
  *    that asymmetry.
  *  - UNK SEMANTICS: if greedy matching STALLS at any position (no
  *    vocab piece, not even a single character, matches there), the
  *    WHOLE word becomes one `[UNK]` token — the BERT contract, where
  *    [[Subword]] falls back to per-character pieces.
  *  - LIKELIHOOD-SCORED TRAINING
  *    ([[graft.operators.Tokenizer.trainWordPiece]]): merges maximize
  *    `count(ab) / (count(a) · count(b))` — the pair that most
  *    increases corpus likelihood under a unigram piece model — not
  *    raw pair frequency (BPE's argmax).
  *
  * Application is greedy longest-match per word position (initial
  * pieces at position 0, `##`-prefixed continuations after), which is
  * a pure function of (word, piece set) — replayable in the DuckDB
  * oracle as a recursive CTE, single deterministic path per word.
  *
  * Scale shape: the counter is the codegen'd [[WordPieceCount]]
  * expression over the normalized word array (the [[SubwordCount]]
  * pattern) — the vocab is a few hundred interned strings loaded from
  * the classpath once per executor JVM (never shipped per-task), the
  * match is O(word_len · max_piece_len) probing pre-split
  * initial/continuation sets (one substring per probe — no per-step
  * "##" concatenation), and the whole projection stays inside
  * whole-stage codegen.
  */
object WordPiece {

  /** Classpath location of the committed vocab (one piece per line,
    * `##`-prefixed continuations; written by `graft.WordPieceVocabGen`
    * through the distributed trainer). */
  val VocabResource = "/graft/wordpiece_vocab.txt"

  /** The committed piece set. Initial pieces and `##`-continuations
    * coexist; single characters are real pieces here (not an implicit
    * fallback — their absence is what produces `[UNK]`). */
  lazy val vocab: Set[String] = {
    val in = getClass.getResourceAsStream(VocabResource)
    require(in != null, s"vocab resource $VocabResource not on classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toSet
    finally in.close()
  }

  /** Longest SURFACE length among pieces (continuation prefix
    * excluded) — the greedy scan's upper window. */
  private lazy val maxSurfaceLen: Int =
    if (vocab.isEmpty) 0
    else vocab.iterator.map(p =>
      if (p.startsWith("##")) p.length - 2 else p.length).max

  /** The committed vocab split once at load into initial pieces and
    * continuation SURFACES (prefix stripped) — the hot counting path
    * probes with a bare substring instead of allocating a
    * "##" + substring candidate per (position, length) step. */
  private lazy val initialPieces: Set[String] =
    vocab.filterNot(_.startsWith("##"))
  private lazy val contSurfaces: Set[String] =
    vocab.collect { case p if p.startsWith("##") => p.substring(2) }

  /** The vocab sorted — for the SQL oracle's inline VALUES table. */
  def vocabSorted: Seq[String] = vocab.toSeq.sorted

  /** Greedy WordPiece segment count of one word against `pieces`:
    * at each position take the LONGEST matching piece (initial form at
    * position 0, `##`-prefixed continuation after); if no piece
    * matches at any position the whole word is one `[UNK]` token.
    * Pure function of (word, pieces) — the oracle replays it with a
    * recursive CTE. Empty words count 0. */
  def segmentCount(word: String, pieces: Set[String], maxLen: Int): Int = {
    if (word.isEmpty) return 0
    var pos = 0
    var n = 0
    while (pos < word.length) {
      var step = 0
      var l = math.min(maxLen, word.length - pos)
      while (l >= 1 && step == 0) {
        val cand =
          if (pos == 0) word.substring(0, l)
          else "##" + word.substring(pos, pos + l)
        if (pieces.contains(cand)) step = l
        l -= 1
      }
      if (step == 0) return 1 // stall anywhere => the whole word is [UNK]
      pos += step
      n += 1
    }
    n
  }

  /** [[segmentCount]] against pre-split initial/continuation sets —
    * one substring per probe, no per-step "##" concatenation.
    * Semantics identical to `segmentCount(word, vocab, maxLen)`
    * (asserted by WordPieceSpec's split≡combined sweep). */
  private def segmentCountSplit(word: String, init: Set[String],
                                cont: Set[String], maxLen: Int): Int = {
    if (word.isEmpty) return 0
    var pos = 0
    var n = 0
    while (pos < word.length) {
      val table = if (pos == 0) init else cont
      var step = 0
      var l = math.min(maxLen, word.length - pos)
      while (l >= 1 && step == 0) {
        if (table.contains(word.substring(pos, pos + l))) step = l
        l -= 1
      }
      if (step == 0) return 1
      pos += step
      n += 1
    }
    n
  }

  /** Static counting kernel shared by [[WordPieceCount]]'s interpreted
    * and generated paths: sum of greedy WordPiece segment counts over a
    * word array (null/empty words count 0, stalled words count 1). */
  def countArray(arr: ArrayData): Long = {
    val init = initialPieces
    val cont = contSurfaces
    val ml = maxSurfaceLen
    var s = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i).toString
        if (w.nonEmpty) s += segmentCountSplit(w, init, cont, ml)
      }
      i += 1
    }
    s
  }

  /** WordPiece token count of a text column: normalize (the shared
    * [[TextFunctions.normalizeText]] chain), split to words, sum
    * greedy segment counts. Empty/blank text counts 0. */
  def wordPieceTokenCount(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(WordPieceCount(
      ColumnShim.expression(TextFunctions.normalizedWords(c))))
  }
}

/** Codegen'd WordPiece token count over an `array<string>` of
  * normalized words (the [[SubwordCount]] pattern): the generated code
  * is one static call into [[WordPiece.countArray]], so the counting
  * projection stays inside whole-stage codegen. NULL input counts 0. */
case class WordPieceCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_count requires array<string> input, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else WordPiece.countArray(v.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${childGen.code}
         |long ${ev.value} = ${childGen.isNull}
         |  ? 0L
         |  : graft.functions.WordPiece.countArray(${childGen.value});
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceCount =
    copy(child = newChild)
}
