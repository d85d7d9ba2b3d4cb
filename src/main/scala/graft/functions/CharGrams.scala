package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-trigram extraction as a NATIVE expression (the
  * SubwordCount/Gpt2TokenCount pattern, applied to the language-ID /
  * NB hot path).
  *
  * The declarative form this replaces —
  * `transform(sequence(1, length(t) - 2), i -> substr(t, i, 3))` —
  * is O(len²) per document AND interpreter-bound: `substr` by
  * CHARACTER position scans the UTF-8 bytes from the start on every
  * call, and `transform` is a higher-order function evaluated outside
  * whole-stage codegen, boxing each element. At sf0.1 that made the
  * trigram pass (1.5M trigrams) ~10× slower than the aggregation it
  * feeds.
  *
  * This kernel slides a 3-character window in ONE pass: for pure-ASCII
  * input (the normalized-text alphabet `[a-z0-9 ]` — every caller
  * feeds `' ' + normalizeText(c) + ' '`) each trigram is an O(1)
  * 3-byte slice; arbitrary input falls back to a code-point walk that
  * matches `substr`'s code-point semantics exactly, so the expression
  * is drop-in equivalent (same strings, same order, same empty-array
  * contract for len < 3) and every committed oracle hash is unchanged.
  */
object CharGrams {

  /** Trigrams of `c` (code-point windows, empty array when the string
    * has fewer than 3 code points). Callers pad/normalize upstream. */
  def charTrigrams(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(CharTrigrams(ColumnShim.expression(c)))
  }

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Shared kernel for the interpreted and generated paths. */
  def trigrams(s: UTF8String): ArrayData = {
    val nBytes = s.numBytes()
    if (nBytes < 3) {
      // < 3 bytes can never hold 3 code points
      if (s.numChars() < 3) return Empty
    }
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) {
      val n = bytes.length - 2
      if (n <= 0) return Empty
      val out = new Array[Any](n)
      var j = 0
      while (j < n) {
        out(j) = UTF8String.fromBytes(bytes, j, 3)
        j += 1
      }
      new GenericArrayData(out)
    } else {
      // code-point walk (multibyte input): one pass collecting the
      // byte offset of every code point, then 3-point windows — the
      // exact strings substr(i, 3) would produce
      val offsets = new java.util.ArrayList[Integer](bytes.length + 1)
      var o = 0
      while (o < bytes.length) {
        offsets.add(o)
        o += UTF8String.numBytesForFirstByte(bytes(o))
      }
      offsets.add(bytes.length)
      val nPoints = offsets.size() - 1
      if (nPoints < 3) return Empty
      val out = new Array[Any](nPoints - 2)
      var k = 0
      while (k < nPoints - 2) {
        val st = offsets.get(k)
        val en = offsets.get(k + 3)
        out(k) = UTF8String.fromBytes(bytes, st, en - st)
        k += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Codegen'd trigram window over a string column: one static call into
  * [[CharGrams.trigrams]], keeping the projection inside whole-stage
  * codegen. NULL input yields NULL (matching the declarative form it
  * replaced, where transform/substr propagate null). */
case class CharTrigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_trigrams requires string input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharGrams.trigrams(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharGrams.trigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): CharTrigrams =
    copy(child = newChild)
}
