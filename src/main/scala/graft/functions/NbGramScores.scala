package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document naive-Bayes gram-score fold: for a document's gram
  * array, returns `array<long>` of per-language sums
  * `s_l = Σ_gram lpq_l(gram)` against a BROADCAST quantized model map
  * (gram → per-language lpq longs, with each language's unseen-gram
  * FLOOR already substituted at map-build time; a gram absent from
  * the map entirely scores the floor vector).
  *
  * Replaces the explode → broadcast-join → groupBy(id) scoring plan of
  * [[graft.operators.LangId.classify]]: the per-language sums are
  * exact LONG additions of exactly the same quantized values, and
  * integer addition is order-free, so the result is value-identical
  * to the join/aggregate form by construction — while the corpus no
  * longer pays an exploded gram row, a hash-join probe row, and a
  * partial-aggregation row per trigram (profiled r16: 18.7 s of task
  * CPU on q_lang_confusion_nb's scoring stage at sf0.1). The model map
  * is ALPHABET-BOUNDED — normalizeText emits [a-z0-9 ], so there are
  * at most 37³ ≈ 50k distinct trigrams at ANY corpus scale — which is
  * what makes collect-and-broadcast the right 100-TB shape here
  * (same argument as the λ table in the DSIR gate).
  *
  * Null/empty gram array → all-zero sums (the caller adds priors and
  * coalesces exactly as the join form's miss path did). */
case class NbGramScores(child: Expression,
                        bc: Broadcast[java.util.HashMap[UTF8String, Array[Long]]],
                        floor: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nb_gram_scores requires array<string>, got ${other.catalogString}")
  }

  /** Shared by interpreted and generated paths. */
  def scoresOf(arr: ArrayData): GenericArrayData = {
    val L = floor.length
    val out = new Array[Long](L)
    if (arr != null) {
      val m = bc.value
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val g = arr.getUTF8String(i)
        val v = if (g == null) null else m.get(g)
        val row = if (v == null) floor else v
        var l = 0
        while (l < L) { out(l) += row(l); l += 1 }
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    scoresOf(child.eval(input).asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val self = ctx.addReferenceObj("nbScores", this, classOf[NbGramScores].getName)
    ev.copy(code =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
         |  $self.scoresOf(${childGen.isNull} ?
         |    (org.apache.spark.sql.catalyst.util.ArrayData) null : ${childGen.value});
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NbGramScores =
    copy(child = newChild)
}

object NbGramScores {
  def column(c: Column,
             bc: Broadcast[java.util.HashMap[UTF8String, Array[Long]]],
             floor: Array[Long]): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(NbGramScores(ColumnShim.expression(c), bc, floor))
  }
}
