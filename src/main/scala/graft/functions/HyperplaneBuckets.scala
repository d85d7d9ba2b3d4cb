package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd multi-band sign-bit LSH bucketing: band `b` of `bands`
  * gets the deterministic hyperplane family
  * `VectorFunctions.hyperplanes(dim, nBits, seed + b)` and the bucket
  * is the `nBits`-bit sign pattern `Σ_i (dot(a, plane_i) >= 0) << i`.
  * Output: `array<long>` of length `bands` (band index = position).
  *
  * Bit-identical to the expression formulation it replaces (one
  * `when(dot(a, array(lit…)) >= 0.0, 1L << i)` chain per band, an
  * `array(struct(lit(b), bucket_b))` + explode): the dot is the same
  * left fold over the same plane doubles, and every degenerate input
  * maps to the same bits — a length-≠-dim or null-element vector made
  * every `dot` NULL, every `when` fall to 0, so bucket 0 in every
  * band; a NaN dot fails `>= 0.0` the same way. What changes is cost:
  * the expression form built `bands * nBits` separate dot
  * expressions over 64-literal arrays inside a struct-array generate —
  * ~32 s of task CPU for 5 000 rows x 16 bands at sf0.1 (profiled
  * r16, q_embedding_dup's banding stage; generated code past the JIT
  * comfort zone falls back to interpreted eval with boxed literal
  * access) — where this kernel is one primitive loop over a shared
  * plane matrix. The expression form stays in OperatorsSpec as the
  * bit-identity anchor. */
case class HyperplaneBuckets(child: Expression, dim: Int, nBits: Int,
                             bands: Int, seed: Long)
    extends UnaryExpression {

  require(dim >= 1 && nBits >= 1 && nBits <= 63 && bands >= 1,
    s"bad hyperplane-bucket shape: dim=$dim nBits=$nBits bands=$bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets requires array<float|double>, got ${child.dataType.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** bands*nBits x dim plane matrix, row (b*nBits + i) = plane i of
    * band b — exactly hyperplanes(dim, nBits, seed + b). */
  @transient lazy val planeMatrix: Array[Array[Double]] =
    (0 until bands).flatMap(b =>
      VectorFunctions.hyperplanes(dim, nBits, seed + b)).toArray

  /** Shared by interpreted and generated paths: buckets for one
    * vector, or all-zero buckets when the vector is not a clean
    * dim-length array (the dot-NULL → bit-0 semantics above). */
  def bucketsOf(arr: ArrayData, float: Boolean): Array[Long] = {
    val out = new Array[Long](bands)
    val n = arr.numElements()
    if (n != dim) return out
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return new Array[Long](bands)
      v(i) = if (float) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val m = planeMatrix
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var bit = 0
      while (bit < nBits) {
        val plane = m(b * nBits + bit)
        var s = 0.0
        var j = 0
        while (j < dim) { s += v(j) * plane(j); j += 1 }
        // Spark's >= is a TOTAL order with NaN greater than everything
        // (the expression form sets the bit on a NaN dot) — mirror it
        if (s >= 0.0 || java.lang.Double.isNaN(s)) bucket += (1L << bit)
        bit += 1
      }
      out(b) = bucket
      b += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(bucketsOf(a.asInstanceOf[ArrayData], isFloat))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hpBuckets", this, classOf[HyperplaneBuckets].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $self.bucketsOf($a, ${isFloat.toString}));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets =
    copy(child = c)
}
