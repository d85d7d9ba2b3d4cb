package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** N-gram token frame extraction as a NATIVE expression (the
  * CharTrigrams pattern applied to the language-model gates).
  *
  * The declarative form this replaces —
  * `transform(sequence(0, size(w)-1), i -> struct(element_at(w, i+1),
  * element_at(w, i+1-k)...))` — is a higher-order function evaluated
  * OUTSIDE whole-stage codegen, boxing one struct per token with
  * `order` interpreted `element_at` probes each. At sf0.1 the order-5
  * token frame alone cost ~11 s of q_pseudo_ppl_5's ~12 s.
  *
  * This kernel splits the normalized text once and emits one
  * InternalRow per token: `word`, `prev1..prev{order-1}` (null while
  * the context reaches before the document start). The SAME
  * UTF8String instance serves as token i's `word` and token i+1's
  * `prev1` — zero per-field copies. Split semantics mirror Spark's
  * `split(text, " ")` exactly (trailing empties kept, `"" -> [""]`),
  * so token positions — and therefore every committed oracle hash —
  * are unchanged. */
object NgramTokens {

  /** The token frame column: array of structs, one per raw
    * split position. Callers explode + filter empty words, exactly as
    * with the HOF form. */
  def ngramTokens(c: Column, order: Int): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(NgramTokensExpr(ColumnShim.expression(c), order))
  }

  /** Shared kernel for interpreted and generated paths. */
  def tokens(s: UTF8String, order: Int): ArrayData = {
    // Spark's split(str, " ") = Java split with limit -1 on the literal
    // (single-char, non-regex-special) separator: trailing empties kept
    val str = s.toString
    val n0 = str.length
    val words = new java.util.ArrayList[UTF8String](16)
    var st = 0
    var i = 0
    while (i <= n0) {
      if (i == n0 || str.charAt(i) == ' ') {
        words.add(UTF8String.fromString(str.substring(st, i)))
        st = i + 1
      }
      i += 1
    }
    val n = words.size()
    val out = new Array[Any](n)
    var t = 0
    while (t < n) {
      val row = new Array[Any](order)
      row(0) = words.get(t)
      var k = 1
      while (k < order) {
        row(k) = if (t < k) null else words.get(t - k)
        k += 1
      }
      out(t) = new GenericInternalRow(row)
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd n-gram token frame over a string column. NULL in, NULL
  * out (the HOF form's contract — explode then drops the row). */
case class NgramTokensExpr(child: Expression, order: Int)
    extends UnaryExpression {
  require(order >= 1, s"order must be >= 1, got $order")

  override def dataType: DataType = ArrayType(
    StructType(
      StructField("word", StringType, nullable = true) +:
        (1 until order).map(k =>
          StructField(s"prev$k", StringType, nullable = true))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_tokens requires string input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NgramTokens.tokens(input.asInstanceOf[UTF8String], order)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramTokens.tokens($c, $order)")

  override protected def withNewChildInternal(newChild: Expression): NgramTokensExpr =
    copy(child = newChild)
}
