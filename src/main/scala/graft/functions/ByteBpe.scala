package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** TRUE byte-level BPE in the GPT-2 discipline (r11 verdict ask #2):
  * merges applied in RANK order over byte-encoded pretokens produced
  * by the GPT-2 pretokenizer regex, case preserved. This is the
  * tokenizer family production pipelines bill by; the greedy
  * longest-match counter ([[Subword.pretrainedTokenCount]]) remains as
  * the differential anchor, and the two deliberately DIVERGE on text
  * where merge priority matters (see Gpt2BpeSpec's hand-replayed
  * divergence case).
  *
  * Every piece of the algorithm is public knowledge (the GPT-2
  * encoder is published at github.com/openai/gpt-2, encoder.py; the
  * byte↔unicode table and the pretokenizer regex below are that
  * published algorithm re-implemented):
  *
  *  1. PRETOKENIZE with the published regex
  *     `'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+`
  *     — contractions split, words carry their one leading space, case
  *     and punctuation PRESERVED (unlike the engine's normalized-word
  *     chain; that is the point of the interop).
  *  2. BYTE-ENCODE each pretoken: UTF-8 bytes, each mapped through the
  *     reversible byte→unicode table (printable bytes map to
  *     themselves; the rest to U+0100.. — space becomes 'Ġ', newline
  *     'Ċ'). Every string is thus representable with zero unknowns.
  *  3. MERGE by rank: repeatedly find the adjacent symbol pair with the
  *     LOWEST merge rank and merge all its non-overlapping occurrences
  *     left-to-right; stop when no adjacent pair is in the merge table.
  *     Token count = final symbol count; token ids via vocab.json.
  *
  * The committed fixture (`/graft/gpt2/{merges.txt,vocab.json}`) is in
  * the exact GPT-2 file layout and is byte-level-TRAINED on the
  * sf0.01 fixture corpus by `graft.Gpt2VocabGen` (the real 50k-merge
  * GPT-2 file cannot ship into this zero-egress sandbox; the loader
  * accepts it unchanged — same format, same semantics). Loading
  * VALIDATES the BPE well-formedness invariant — each merge's sides
  * are single byte symbols or results of strictly earlier merges —
  * which any genuinely-trained merges file satisfies (a violating
  * file is not BPE output and its merges could never apply).
  *
  * Scale shape: counting is a codegen'd [[Gpt2TokenCount]] expression
  * (no ScalaUDF node) calling this kernel; the merge table lives once
  * per JVM (classpath lazy val, never shipped per-task) and a bounded
  * per-pretoken memo ([[bpeCache]]) makes the amortized cost of a
  * Zipf-distributed corpus one hash probe per pretoken.
  *
  * ORACLE EQUIVALENCE: the DuckDB recursive CTE carries the ACTIVE
  * pair — while the pair just merged still occurs it keeps merging
  * its first occurrence, which replays the engine's left-to-right
  * all-occurrences pass exactly (merging (a,b)→ab can destroy but
  * never create further (a,b) occurrences — new pairs involve the
  * longer symbol ab); only when the pair is exhausted does it re-find
  * the global minimum rank, the encoder's next pass. This holds for
  * ANY merges file, including duplicate-producer ones (two merges
  * yielding the same result string — present in real BPE tables),
  * where a plain first-occurrence + global-re-find replay could
  * diverge: a duplicate producer can give a pair involving the merged
  * symbol a LOWER rank than the remaining occurrences of the pair
  * mid-pass, and the encoder finishes its pass regardless.
  */
object ByteBpe {

  // ---- byte <-> unicode table (published GPT-2 construction) ----

  /** byte value -> representative char: printable latin-1 ranges
    * ['!','~'], ['¡','¬'], ['®','ÿ'] map to themselves, the remaining
    * 68 bytes map to U+0100, U+0101, ... in byte order. */
  lazy val byteToChar: Array[Char] = {
    val keep = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).map(_.toInt).toSet
    val arr = new Array[Char](256)
    var next = 256
    var b = 0
    while (b < 256) {
      if (keep(b)) arr(b) = b.toChar
      else { arr(b) = next.toChar; next += 1 }
      b += 1
    }
    arr
  }

  lazy val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  // ---- pretokenizer ----

  /** The published GPT-2 pretokenizer regex, verbatim. */
  val PretokenPattern: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""

  private val pretokenRe = java.util.regex.Pattern.compile(
    PretokenPattern, java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** Split text into GPT-2 pretokens (lossless: concat == input). */
  def pretokenize(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Nil
    val m = pretokenRe.matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** One pretoken -> initial byte symbols (each a 1-char string from
    * the byte→unicode table). */
  def toByteSymbols(pretoken: String): Array[String] = {
    val bytes = pretoken.getBytes("UTF-8")
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = String.valueOf(byteToChar(bytes(i) & 0xff))
      i += 1
    }
    out
  }

  // ---- the merge loop (encoder.py semantics) ----

  /** Apply merges in rank order: find the lowest-rank adjacent pair,
    * merge all its non-overlapping occurrences left-to-right, repeat.
    * `ranks` is keyed "left right" (symbols never contain a space —
    * byte 0x20 maps to 'Ġ' — so the separator is unambiguous). */
  def bpe(symsIn: Array[String],
          ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var word = symsIn
    var run = word.length >= 2
    while (run) {
      var best = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < word.length - 1) {
        val r = ranks.get(word(i) + " " + word(i + 1))
        if (r != null && r.intValue() < best) {
          best = r.intValue(); bestA = word(i); bestB = word(i + 1)
        }
        i += 1
      }
      if (bestA == null) run = false
      else {
        val merged = bestA + bestB
        val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
        var j = 0
        while (j < word.length) {
          if (j < word.length - 1 && word(j) == bestA && word(j + 1) == bestB) {
            out += merged; j += 2
          } else { out += word(j); j += 1 }
        }
        word = out.toArray
        run = word.length >= 2
      }
    }
    word
  }

  // ---- committed fixture ----

  val MergesResource = "/graft/gpt2/merges.txt"
  val VocabResource = "/graft/gpt2/vocab.json"

  private def readResource(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"gpt2 resource $path not on classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Parse a GPT-2 merges.txt (optional `#version` header, one
    * "left right" pair per line in rank order) and VALIDATE the BPE
    * well-formedness invariants: each side is a single byte symbol or
    * the result of a strictly earlier merge, and no PAIR repeats — a
    * duplicate pair is impossible in genuine BPE training output
    * (after a pair is merged everywhere, its count is zero; it can
    * only re-enter via a duplicate-PRODUCER, whose occurrences carry
    * the producer's own rank). Fail-loud on violation — a file outside
    * these invariants is not the output of BPE training and would
    * break the oracle's first-occurrence equivalence. Uniqueness as a
    * loader invariant (rather than a silent first-or-last-wins pick)
    * also removes the one case where [[ranks]] could diverge from the
    * reference encoder's `dict(zip(merges, ...))`, which is
    * LAST-occurrence-wins. */
  def parseMerges(lines: Iterator[String]): IndexedSeq[(String, String)] = {
    val pairs = lines.map(_.stripLineEnd)
      .filter(l => l.nonEmpty && !l.startsWith("#version"))
      .map { l =>
        val sp = l.indexOf(' ')
        require(sp > 0 && l.indexOf(' ', sp + 1) < 0,
          s"malformed merges line: '$l'")
        (l.substring(0, sp), l.substring(sp + 1))
      }.toIndexedSeq
    val resultRank = scala.collection.mutable.Map.empty[String, Int]
    val seenPairs = scala.collection.mutable.Set.empty[(String, String)]
    pairs.zipWithIndex.foreach { case ((a, b), r) =>
      def wellFormed(s: String): Boolean =
        (s.length == 1 && charToByte.contains(s.charAt(0))) ||
          resultRank.get(s).exists(_ < r)
      require(wellFormed(a) && wellFormed(b),
        s"merge $r ('$a' '$b') uses a symbol not derivable from earlier " +
          "merges — not a BPE-trained file")
      // a FILE with a repeated pair is malformed: the second
      // occurrence is unreachable (its pair never survives the first
      // merge) and the reference encoder's dict would silently shadow
      // one of the ranks. The raw training SEQUENCE can legitimately
      // repeat a pair via duplicate-producer re-formation — which is
      // exactly why the trainer contract (Tokenizer.trainBpe scaladoc,
      // Gpt2VocabGen) requires writers to `.distinct` before writing;
      // this guard enforces that contract at load time.
      require(seenPairs.add((a, b)),
        s"merge $r ('$a' '$b') repeats an earlier pair — a merges FILE " +
          "must be distinct (writers dedupe the raw training sequence; " +
          "see Tokenizer.trainBpe)")
      if (!resultRank.contains(a + b)) resultRank(a + b) = r
    }
    pairs
  }

  /** Merge list in rank order, from the committed fixture. */
  lazy val merges: IndexedSeq[(String, String)] =
    parseMerges(readResource(MergesResource).linesIterator)

  /** "left right" -> rank. [[parseMerges]] guarantees pair keys are
    * UNIQUE (a duplicate-pair file is rejected at load), so there is
    * no first-vs-last-wins choice to make here — the map is exactly
    * the reference encoder's `dict(zip(merges, range(...)))` on every
    * loadable file. */
  lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      m.put(a + " " + b, r)
    }
    m
  }

  /** token string -> id, from vocab.json. */
  lazy val vocabIds: Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(readResource(VocabResource))
    require(node != null && node.isObject, "vocab.json must be an object")
    node.fields().asScala.map(e => e.getKey -> e.getValue.asInt()).toMap
  }

  private lazy val idToToken: Map[Int, String] =
    vocabIds.map(_.swap)

  // ---- counting / encoding ----

  /** Bounded per-pretoken memo (the reference encoder keeps the same
    * cache): Zipf corpora re-tokenize the same pretokens constantly.
    * Bounded BOTH by entry count and by an approximate byte budget —
    * unsegmented text (CJK, long letter runs) makes one pretoken per
    * document via ` ?\p{L}+`, so an entry-count bound alone could
    * accumulate 200k document-sized key+array pairs per executor JVM
    * (r12 ADVICE). Pretokens past [[MaxCachePretokenLen]] are never
    * cached at all (a >4 KB pretoken is not a Zipf-head repeat worth
    * memoizing, and its O(len²) merge cost dwarfs one hash probe).
    * Cleared wholesale past either bound — correctness never depends
    * on it. */
  private val bpeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val CacheBound = 200000
  private val CacheByteBudget = 64L << 20 // ~64 MB of cached chars/JVM
  private val MaxCachePretokenLen = 4096
  private val cacheChars = new java.util.concurrent.atomic.AtomicLong(0L)

  private def bpeCached(pretoken: String): Array[String] = {
    val hit = bpeCache.get(pretoken)
    if (hit != null) return hit
    val res = bpe(toByteSymbols(pretoken), ranks)
    if (pretoken.length <= MaxCachePretokenLen) {
      if (bpeCache.size() >= CacheBound ||
          cacheChars.get() * 2 >= CacheByteBudget) {
        bpeCache.clear()
        cacheChars.set(0L)
      }
      if (bpeCache.put(pretoken, res) == null) {
        // key chars + result symbol chars (each UTF-16 char ~2 bytes;
        // the ×2 happens at the budget comparison above)
        var n = pretoken.length.toLong
        res.foreach(s => n += s.length)
        cacheChars.addAndGet(n)
      }
    }
    res
  }

  /** Number of BPE tokens of `text` under the committed merges. */
  def tokenCount(text: String): Long = {
    if (text == null || text.isEmpty) return 0L
    var n = 0L
    pretokenize(text).foreach(pt => n += bpeCached(pt).length)
    n
  }

  /** Token id sequence (vocab.json ids; -1 for a symbol missing from
    * vocab.json — cannot happen when vocab covers all byte singles and
    * merge results, which the loader-accepted fixture guarantees). */
  def tokenIds(text: String): Array[Int] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    pretokenize(text).foreach { pt =>
      bpeCached(pt).foreach(s => out += vocabIds.getOrElse(s, -1))
    }
    out.toArray
  }

  /** Inverse of [[tokenIds]] (test support): ids -> symbol strings ->
    * bytes -> UTF-8 text. */
  def decode(ids: Seq[Int]): String = {
    val sb = new StringBuilder
    ids.foreach(id => sb.append(idToToken.getOrElse(id,
      throw new IllegalArgumentException(s"unknown token id $id"))))
    val bytes = sb.toString.map(c => charToByte(c).toByte).toArray
    new String(bytes, "UTF-8")
  }

  // ---- oracle support ----

  /** The merge table keyed by HEX of the underlying raw bytes — the
    * form the DuckDB oracle can derive in-plan (`hex(encode(tok))`
    * split into byte pairs), sidestepping the byte→unicode table in
    * SQL entirely. Key = hex(left) || ' ' || hex(right), uppercase. */
  def hexRanks: Seq[(String, Int)] = {
    def hexOf(sym: String): String =
      sym.map(c => f"${charToByte(c)}%02X").mkString
    merges.zipWithIndex.map { case ((a, b), r) =>
      (hexOf(a) + " " + hexOf(b)) -> r
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
      .toSeq.sortBy(_._2)
  }

  /** The GPT-2 pretokens of `text`, each already byte→unicode MAPPED
    * (the symbol alphabet the merge loop and the TRAINER operate in).
    * Distinct texts can share pretokens — the trainer's groupBy key. */
  def mappedPretokens(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    pretokenize(text).iterator
      .map(pt => toByteSymbols(pt).mkString).toArray
  }

  // ---- Spark surface ----

  /** Mapped-pretoken array column — codegen'd, no ScalaUDF; the
    * distributed BPE trainer's scan expression. */
  def gpt2Pretokens(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(Gpt2Pretokens(ColumnShim.expression(c)))
  }

  /** BPE token count column — a codegen'd expression, no ScalaUDF. */
  def gpt2TokenCount(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(Gpt2TokenCount(ColumnShim.expression(c)))
  }

  /** BPE token ID column (array&lt;int&gt; of vocab.json ids) — the
    * payload a training pipeline actually materializes; codegen'd. */
  def gpt2TokenIdArray(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(Gpt2TokenIds(ColumnShim.expression(c)))
  }

  /** Known special tokens — vocab entries that are TRAINER-inserted
    * markers, not merge output. NOTE every char of `<|endoftext|>` IS
    * byte-decodable (it is made of printable ASCII), so a
    * "byte-decodable" filter alone would NOT exclude it — it must be
    * excluded by name (r12 ADVICE: the old comment claimed otherwise). */
  val SpecialTokens: Set[String] = Set("<|endoftext|>")

  /** The special-token id resolved from the committed vocab.json — the
    * value callers should terminate documents with (hardcoding 0 is
    * only correct for THIS fixture; a real GPT-2 vocab.json has
    * `<|endoftext|>` = 50256 and id 0 = '!'). */
  lazy val endOfTextId: Int = vocabIds("<|endoftext|>")

  /** The vocab keyed by HEX of each token's raw bytes — the id-map
    * form the DuckDB oracle joins its final hex symbols against
    * (sidestepping the byte→unicode table in SQL, like [[hexRanks]]).
    * [[SpecialTokens]] are excluded BY NAME: they are never merge
    * output, so they must not shadow a (theoretical) colliding merge
    * result in the oracle's symbol→id lookup. */
  def hexVocabIds: Seq[(String, Int)] =
    vocabIds.toSeq.flatMap { case (tok, id) =>
      if (!SpecialTokens(tok) && tok.forall(charToByte.contains))
        Some(tok.map(c => f"${charToByte(c)}%02X").mkString -> id)
      else None
    }.sortBy(_._2)

  /** DuckDB MAP literal `{'41': chr(65), ...}` mapping each byte's
    * uppercase hex to its byte→unicode representative char — lets an
    * oracle reconstruct the engine's MAPPED symbol strings from
    * `hex(encode(tok))` without any string-literal escaping (chr()
    * sidesteps quotes/backslashes entirely). Used by the BPE TRAINER
    * oracle, whose tie-break order is defined on mapped symbols. */
  def chrMapSql: String =
    (0 until 256).map(b => f"'$b%02X': chr(${byteToChar(b).toInt})")
      .mkString("MAP {", ", ", "}")
}

/** Codegen'd `ByteBpe.tokenCount` over a string column (the
  * MinhashSig/SimhashFp pattern — r8): the generated code is one
  * static call into the shared kernel, so the projection stays inside
  * whole-stage codegen instead of paying the ScalaUDF
  * encode/decode/closure tax per row. NULL input counts 0 (a missing
  * document has no tokens — matches the UDF-era contract of
  * Subword.tokenCountFor). */
case class Gpt2TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gpt2_token_count requires string input, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else ByteBpe.tokenCount(v.asInstanceOf[UTF8String].toString)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${childGen.code}
         |long ${ev.value} = ${childGen.isNull}
         |  ? 0L
         |  : graft.functions.ByteBpe.tokenCount(${childGen.value}.toString());
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Gpt2TokenCount =
    copy(child = newChild)
}

/** Codegen'd `ByteBpe.tokenIds` over a string column: the vocab-id
  * sequence (array&lt;int&gt;) a pretraining pipeline materializes and
  * packs. NULL input yields an empty array (same no-tokens contract as
  * [[Gpt2TokenCount]]); never null itself. */
case class Gpt2TokenIds(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, IntegerType}

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gpt2_token_ids requires string input, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[Int])
    else new GenericArrayData(
      ByteBpe.tokenIds(v.asInstanceOf[UTF8String].toString))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val gad = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    ev.copy(code =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  new $gad(${childGen.isNull}
         |    ? new int[0]
         |    : graft.functions.ByteBpe.tokenIds(${childGen.value}.toString()));
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Gpt2TokenIds =
    copy(child = newChild)
}

/** Codegen'd `ByteBpe.mappedPretokens` over a string column: the
  * byte→unicode-mapped GPT-2 pretoken array — the distributed BPE
  * TRAINER's corpus-scan expression (one static call, stays inside
  * whole-stage codegen). NULL input yields an empty array. */
case class Gpt2Pretokens(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.ArrayType

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gpt2_pretokens requires string input, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[Any])
    else Gpt2Pretokens.toArrayData(v.asInstanceOf[UTF8String].toString)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val gad = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    val helper = classOf[Gpt2Pretokens].getName
    ev.copy(code =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  $helper.toArrayData(${childGen.isNull}
         |    ? null : ${childGen.value}.toString());
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Gpt2Pretokens =
    copy(child = newChild)
}

object Gpt2Pretokens {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  /** Codegen entry point: mapped pretokens as Catalyst ArrayData. */
  def toArrayData(text: String): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    new GenericArrayData(
      ByteBpe.mappedPretokens(text).map(UTF8String.fromString(_)): Array[Any])
  }
}
