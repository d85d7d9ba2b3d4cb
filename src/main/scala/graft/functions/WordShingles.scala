package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as a NATIVE expression (the CharTrigrams /
  * NgramTokens pattern applied to the dedup family's feature pass).
  *
  * The declarative form this replaces chained n−1 `zip_with` calls —
  * higher-order functions evaluated outside whole-stage codegen, each
  * boxing every element and running an interpreted `concat_ws` per
  * position — so every MinHash/SimHash/Jaccard/contamination/
  * leakage-split query paid an interpreter pass just to build its
  * shingles. This kernel emits each shingle with ONE
  * `UTF8String.concatWs` over an index window (byte-level append, no
  * intermediate strings).
  *
  * Drop-in exact: `size(words) <= n` folds to ONE shingle joining all
  * words; otherwise shingle i joins words i..i+n−1; null elements are
  * skipped by the join exactly as `concat_ws` does. Every committed
  * oracle hash is unchanged (full-suite sweep). One deliberate
  * divergence from the old chain: at n = 1 with m > 1 the old slice
  * path PRESERVED null elements where this kernel's join folds them
  * to "" (the schema here is containsNull = false) — no caller passes
  * nullable word arrays (every consumer feeds `normalizedWords`,
  * whose split never yields nulls), and "" is what the concat_ws
  * contract gives every other (m, n) combination.
  */
object WordShingles {

  /** Shared kernel for interpreted and generated paths. */
  def shingles(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    val sep = UTF8String.fromString(" ")
    val words = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      words(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    if (m <= n) {
      new GenericArrayData(Array[Any](UTF8String.concatWs(sep, words: _*)))
    } else {
      val out = new Array[Any](m - n + 1)
      var j = 0
      while (j <= m - n) {
        out(j) = UTF8String.concatWs(sep,
          java.util.Arrays.copyOfRange(words, j, j + n): _*)
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Codegen'd shingle window over an `array<string>` of words. NULL
  * input yields NULL (the zip_with chain's contract). */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}
