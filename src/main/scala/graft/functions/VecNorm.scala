package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd Euclidean norm over an `array<float|double>` column.
  *
  * Bit-identical to the higher-order-function formulation
  * `sqrt(aggregate(a, 0.0, (acc, v) => acc + v.castD * v.castD))`:
  * the sum is the same left fold in element order, floats widen
  * exactly, a null element poisons the fold to null (acc + null),
  * an empty array yields sqrt(0.0) = 0.0. The HOF form evaluates
  * interpreted with per-element Catalyst allocation AND knocks its
  * whole projection out of whole-stage codegen (lambda functions are
  * CodegenFallback), which taxed every expression sharing the stage —
  * the r16 profile of q_embedding_dup showed 26 s of task CPU on a
  * 30M-flop projection. Same hazard class as [[DotProduct]]'s
  * scaladoc; [[VectorFunctions.norm2Hof]] stays as the bit-identity
  * test anchor. */
case class VecNorm2(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"vec_norm2 requires array<float|double>, got ${child.dataType.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val f = isFloat
    var s = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val x = if (f) arr.getFloat(i).toDouble else arr.getDouble(i)
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get =
        if (isFloat) (i: String) => s"((double) $a.getFloat($i))"
        else (i: String) => s"$a.getDouble($i)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      s"""
         |final int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $x = ${get(i)};
         |  $s += $x * $x;
         |}
         |if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($s); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): VecNorm2 =
    copy(child = c)
}

/** Codegen'd L2 normalization over an `array<float|double>` column —
  * the one-pass kernel form of [[VectorFunctions.normalizeHof]]:
  *
  *   n = norm2(a);  n == 0.0 ? cast(a as array<double>)
  *                           : transform(a, v => v.castD / n)
  *
  * Bit-identical corner cases preserved: empty array and all-zero
  * vector return the cast input (norm 0 branch); an array containing
  * ANY null element returns an array of ALL nulls of the same length
  * (the HOF's when-condition goes null -> otherwise-branch, and the
  * transform divides every element by a null norm); null input is
  * null. The HOF form's lambda CAPTURED the whole norm2 aggregate
  * subtree, re-evaluating an O(dim) interpreted fold per ELEMENT —
  * O(dim²) boxed evals per row (the shinglesFromWords hazard,
  * documented there) — and dragged its projection out of codegen. */
case class VecNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"vec_normalize requires array<float|double>, got ${child.dataType.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val f = isFloat
    val out = new Array[Any](n)
    var s = 0.0
    var i = 0
    var hasNull = false
    while (i < n && !hasNull) {
      if (arr.isNullAt(i)) hasNull = true
      else {
        val x = if (f) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = x
        s += x * x
      }
      i += 1
    }
    if (hasNull) return new GenericArrayData(new Array[Any](n))
    val norm = math.sqrt(s)
    if (norm != 0.0) {
      var j = 0
      while (j < n) {
        out(j) = out(j).asInstanceOf[Double] / norm
        j += 1
      }
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get =
        if (isFloat) (i: String) => s"((double) $a.getFloat($i))"
        else (i: String) => s"$a.getDouble($i)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      val hasNull = ctx.freshName("hasNull")
      val norm = ctx.freshName("norm")
      s"""
         |final int $n = $a.numElements();
         |final Object[] $out = new Object[$n];
         |double $s = 0.0;
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n && !$hasNull; $i++) {
         |  if ($a.isNullAt($i)) { $hasNull = true; }
         |  else {
         |    final double $x = ${get(i)};
         |    $out[$i] = $x;
         |    $s += $x * $x;
         |  }
         |}
         |if ($hasNull) {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$n]);
         |} else {
         |  final double $norm = java.lang.Math.sqrt($s);
         |  if ($norm != 0.0) {
         |    for (int $j = 0; $j < $n; $j++) {
         |      $out[$j] = ((Double) $out[$j]).doubleValue() / $norm;
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): VecNormalize =
    copy(child = c)
}
