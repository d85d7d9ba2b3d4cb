package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dense dot product over `array<float|double>` columns.
  *
  * Bit-identical to the higher-order-function formulation
  * `aggregate(zip_with(a, b, (x, y) => x.castD * y.castD), 0.0,
  * (acc, v) => acc + v)` — the sum is the same left fold in element
  * order, float operands widen exactly to double, a length mismatch or
  * null element yields null (zip_with pads with null and `acc + null`
  * absorbs) — so swapping it into an existing query changes neither
  * results nor oracle hashes. The difference is cost: HOF lambdas
  * evaluate interpreted with per-element Catalyst allocation, which made
  * the pairwise verify stage of embedding near-dup ~10x slower than this
  * tight primitive loop (the same hazard already documented at
  * Serving.scala:85-87 and solved for ANN top-k with primitive heaps).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean =
    dt == FloatType || dt == DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _)) if elemOk(lt) && elemOk(rt) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "dot_product requires array<float> or array<double> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val n = arrA.numElements()
    if (n != arrB.numElements()) return null
    val aIsFloat = elemType(left) == FloatType
    val bIsFloat = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
      val x = if (aIsFloat) arrA.getFloat(i).toDouble else arrA.getDouble(i)
      val y = if (bIsFloat) arrB.getFloat(i).toDouble else arrB.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def getter(e: Expression, arr: String, i: String): String =
        if (elemType(e) == FloatType) s"((double) $arr.getFloat($i))"
        else s"$arr.getDouble($i)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ${getter(left, a, i)} * ${getter(right, b, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
