package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd one-pass 64-bit SimHash over an `array<long>` of word
  * hashes.
  *
  * Bit-identical to the higher-order-function formulation
  * `sum_b(when(aggregate(h, 0, (acc, x) => acc + when((x >> b) & 1 === 1,
  * 1).otherwise(-1)) > 0, 1L << b).otherwise(0))` including its edge
  * semantics: a NULL array yields fingerprint 0 (every per-bit `when`
  * falls to `otherwise(0)`), a null element votes -1 on every bit (the
  * inner `when` on a null condition falls to `otherwise(-1)`), and an
  * empty array yields 0 (zero votes are not > 0). The difference is
  * cost: the HOF form runs 64 interpreted aggregate passes over the
  * hash array per row; this kernel is one pass with an int[64] vote
  * accumulator. Never null, so downstream banding needs no null
  * branch.
  */
case class SimhashFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_fp requires array<bigint> input, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < 64) { votes(b) -= 1; b += 1 }
      } else {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val arr = childGen.value
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val b = ctx.freshName("b")
    val h = ctx.freshName("h")
    val votes = ctx.freshName("votes")
    ev.copy(code =
      code"""
         |${childGen.code}
         |long ${ev.value} = 0L;
         |if (!${childGen.isNull}) {
         |  final int $n = $arr.numElements();
         |  final int[] $votes = new int[64];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($arr.isNullAt($i)) {
         |      for (int $b = 0; $b < 64; $b++) $votes[$b]--;
         |    } else {
         |      final long $h = $arr.getLong($i);
         |      for (int $b = 0; $b < 64; $b++) {
         |        if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |      }
         |    }
         |  }
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ($votes[$b] > 0) ${ev.value} |= (1L << $b);
         |  }
         |}
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashFp =
    copy(child = newChild)
}
