package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Deterministic subword tokenization for the packing / length-stats
  * operators — the BPE-flavored sibling of [[TextFunctions.wsTokenCount]].
  * A real pretraining pipeline packs subword tokens, not whitespace
  * words (counts differ 1.3-1.7×, which shifts every offset and
  * straddle statistic), so the packing operators accept a token-count
  * column and this module supplies a subword one that is exactly
  * reproducible in any engine.
  *
  * Two deterministic halves:
  *
  *  - TRAINING ([[train]]): classic byte-pair-encoding merges over a
  *    word-frequency map — repeatedly merge the most frequent adjacent
  *    symbol pair, ties broken lexicographically, so the same corpus
  *    always yields the same vocab. The committed vocab
  *    (`graft/subword_vocab.txt`, one piece per line) was trained by
  *    `graft.SubwordTrainMain` on the sf0.01 fixture corpus.
  *
  *  - APPLICATION ([[subwordTokenCount]]): greedy longest-match
  *    (WordPiece-style) against the vocab, single-character fallback.
  *    Longest-match rather than merge-order replay because it is a
  *    pure function of (word, vocab-as-set) — expressible as a
  *    recursive CTE in the SQL oracle, where merge-order replay (an
  *    order-dependent loop over the merge list) is not. Both halves
  *    are deterministic; together they give subword counts that any
  *    engine can recompute bit-exactly.
  *
  * Scale shape: the counter is the codegen'd [[SubwordCount]]
  * expression over the already-normalized word array — a native
  * Expression (not a built-in chain) because data-dependent
  * longest-match needs a loop no SQL expression provides; it stays
  * cheap — the vocab is a few hundred interned strings on each
  * executor (lazy val, loaded from the classpath once per JVM, never
  * shipped per-task) and the match is O(word_len · max_piece_len) with
  * zero allocation per step, inside whole-stage codegen. */
object Subword {

  /** Classpath location of the committed vocab (one piece per line). */
  val VocabResource = "/graft/subword_vocab.txt"

  /** The committed vocab as a set; pieces are all length >= 2 (single
    * characters are the implicit fallback, never stored). */
  lazy val vocab: Set[String] = loadResource(VocabResource)

  private lazy val maxPieceLen: Int =
    if (vocab.isEmpty) 0 else vocab.iterator.map(_.length).max

  private[graft] def loadResource(path: String): Set[String] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"vocab resource $path not on classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.length >= 2).toSet
    finally in.close()
  }

  /** Greedy longest-match segment count of one word: at each position
    * take the longest vocab piece matching there (min length 2), else
    * consume one character; count segments. Pure function of
    * (word, pieces) — the SQL oracle replays it with a recursive CTE. */
  def segmentCount(word: String, pieces: Set[String], maxLen: Int): Int = {
    var pos = 0
    var n = 0
    while (pos < word.length) {
      var step = 1
      var l = math.min(maxLen, word.length - pos)
      while (l >= 2 && step == 1) {
        if (pieces.contains(word.substring(pos, pos + l))) step = l
        l -= 1
      }
      pos += step
      n += 1
    }
    n
  }

  /** Subword token count of a text column: normalize (same chain as
    * every text operator), split to words, sum greedy segment counts.
    * Empty/blank text counts 0. */
  def subwordTokenCount(c: Column): Column = tokenCountFor(c, pretrained = false)

  /** Subword token count against the PRETRAINED vocab
    * ([[pretrainedVocab]], loaded from GPT-2-format merges+vocab
    * files) — same greedy longest-match kernel, so the same
    * recursive-CTE oracle replays it with the pretrained piece set
    * inlined. Packing routes through it via
    * `Packing.packOffsets(tokenCount = Subword.pretrainedTokenCount)`. */
  def pretrainedTokenCount(c: Column): Column = tokenCountFor(c, pretrained = true)

  /** Shared counting expression — a codegen'd [[SubwordCount]] (the
    * MinhashSig pattern, r11 ask #3; this was an interpreted ScalaUDF
    * through r11, breaking whole-stage codegen on every q_token_count/
    * packing/length-quantile projection). The expression carries only
    * the Boolean — the piece sets resolve from this object's lazy vals
    * on each executor (loaded from the classpath once per JVM, never
    * shipped per-task). */
  private def tokenCountFor(c: Column, pretrained: Boolean): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(SubwordCount(
      ColumnShim.expression(TextFunctions.normalizedWords(c)), pretrained))
  }

  /** Static counting kernel shared by [[SubwordCount]]'s interpreted
    * and generated paths: sum of greedy segment counts over a word
    * array (null words and empties count 0). */
  def countArray(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                 pretrained: Boolean): Long = {
    val v = if (pretrained) pretrainedVocab else vocab
    val ml = if (pretrained) pretrainedMaxLen else maxPieceLen
    var s = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i).toString
        if (w.nonEmpty) s += segmentCount(w, v, ml)
      }
      i += 1
    }
    s
  }

  // ---- Pretrained-tokenizer vocab interop (GPT-2 file formats) ----

  /** Classpath locations of the committed pretrained-tokenizer fixture
    * (GPT-2 byte-level-BPE file formats: `merges.txt` = optional
    * `#version` header then one "A B" pair per line in merge-priority
    * order; `vocab.json` = a token→id JSON object). Written by
    * `graft.PretrainedVocabGen`. */
  val PretrainedMergesResource = "/graft/pretrained/merges.txt"
  val PretrainedVocabResource = "/graft/pretrained/vocab.json"

  /** Normalize one pretrained token into this engine's text alphabet:
    * strip the byte-level boundary markers (GPT-2 'Ġ' = leading space,
    * 'Ċ' = newline, SentencePiece '▁'), lowercase, and keep only
    * [a-z0-9]+ pieces of length ≥ 2 — [[TextFunctions.normalizeText]]
    * guarantees scored words never contain anything else, so
    * out-of-alphabet pieces (punctuation tokens, specials like
    * &lt;|endoftext|&gt;) could never match and are dropped here. */
  private[graft] def normalizePiece(tok: String): Option[String] = {
    val t = tok.replace("Ġ", "").replace("Ċ", "")
      .replace("▁", "").toLowerCase
    val ok = t.length >= 2 && t.forall(ch =>
      (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9'))
    if (ok) Some(t) else None
  }

  /** Parse GPT-2 merges.txt lines: each merge's RESULT (left+right) is
    * a vocab piece. Greedy longest-match deliberately ignores the
    * priority ORDER (see the module scaladoc: longest-match is the
    * oracle-replayable discipline; merge-order replay is not
    * SQL-expressible), so only the piece set survives parsing. */
  private[graft] def parseMerges(lines: Iterator[String]): Seq[String] =
    lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.split(' ')).collect { case Array(a, b) => a + b }
      .flatMap(normalizePiece).toSeq

  /** Parse GPT-2 vocab.json ({"token": id, ...}): the keys are the
    * token strings; ids are irrelevant to counting. */
  private[graft] def parseVocabJson(text: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    require(node != null && node.isObject,
      "vocab.json must be a JSON object of token -> id")
    node.fieldNames().asScala.flatMap(normalizePiece).toSeq
  }

  /** The committed pretrained piece set: merges ∪ vocab keys, both
    * normalized. Lazy, classpath-loaded once per JVM like [[vocab]]. */
  lazy val pretrainedVocab: Set[String] = {
    def read(path: String): String = {
      val in = getClass.getResourceAsStream(path)
      require(in != null, s"pretrained resource $path not on classpath")
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val pieces = (parseMerges(read(PretrainedMergesResource).linesIterator) ++
      parseVocabJson(read(PretrainedVocabResource))).toSet
    require(pieces.nonEmpty, "pretrained vocab empty after normalization")
    pieces
  }

  private[functions] lazy val pretrainedMaxLen: Int =
    if (pretrainedVocab.isEmpty) 0 else pretrainedVocab.iterator.map(_.length).max

  /** The pretrained pieces sorted — for the SQL oracle's VALUES table. */
  def pretrainedVocabSorted: Seq[String] = pretrainedVocab.toSeq.sorted

  /** The vocab as a deterministic sorted list — for building the SQL
    * oracle's inline VALUES table. */
  def vocabSorted: Seq[String] = vocab.toSeq.sorted

  /** Deterministic BPE training: `nMerges` rounds of merging the most
    * frequent adjacent symbol pair across the word-frequency map
    * (frequencies weight by word count; ties break on the
    * lexicographically smallest pair). Returns the merge results — the
    * vocab pieces — in merge order. Driver-side by design: training is
    * a one-time offline step over a word-frequency map that is
    * vocabulary-sized, never corpus-sized. */
  def train(wordCounts: Map[String, Long], nMerges: Int): Seq[String] =
    trainMerges(wordCounts, nMerges).map { case (a, b) => a + b }.distinct

  /** [[train]] exposing each merge as its (left, right) PAIR in merge
    * order — the GPT-2 merges.txt line format ("left right" per line),
    * which `graft.PretrainedVocabGen` writes verbatim. */
  def trainMerges(wordCounts: Map[String, Long],
                  nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 1)
    var words: Vector[(Vector[String], Long)] =
      wordCounts.toVector.sortBy(_._1)
        .map { case (w, c) => w.map(_.toString).toVector -> c }
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      val pairCounts =
        scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val (bestPair, _) = pairCounts.reduceLeft { (a, b) =>
          if (b._2 > a._2 ||
            (b._2 == a._2 &&
              (b._1._1 < a._1._1 ||
                (b._1._1 == a._1._1 && b._1._2 < a._1._2)))) b
          else a
        }
        val merged = bestPair._1 + bestPair._2
        merges += bestPair
        words = words.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 &&
              syms(i) == bestPair._1 && syms(i + 1) == bestPair._2) {
              out += merged
              i += 2
            } else {
              out += syms(i)
              i += 1
            }
          }
          (out.result(), c)
        }
        m += 1
      }
    }
    merges.result().distinct
  }
}

/** Codegen'd greedy-subword token count over an `array<string>` of
  * normalized words (the MinhashSig/SimhashFp pattern — r8, applied
  * here per r11 verdict ask #3): the generated code is one static call
  * into [[Subword.countArray]], so q_token_count/_pre/_bpe, BPE
  * packing, and the length-quantile frames stay inside whole-stage
  * codegen instead of paying the ScalaUDF row-conversion tax. NULL
  * input counts 0 (matches the UDF-era contract). */
case class SubwordCount(child: Expression, pretrained: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"subword_count requires array<string> input, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else Subword.countArray(v.asInstanceOf[ArrayData], pretrained)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${childGen.code}
         |long ${ev.value} = ${childGen.isNull}
         |  ? 0L
         |  : graft.functions.Subword.countArray(${childGen.value}, $pretrained);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
}
