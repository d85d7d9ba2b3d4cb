package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd one-pass MinHash signature over an `array<long>` of base
  * shingle hashes.
  *
  * Bit-identical to the higher-order-function formulation
  * `array(array_min(transform(h, x => rotl(x, rot_k) ^ mask_k)), ...)`
  * with the lane constants from [[MinhashSig.lanes]], INCLUDING the
  * null edges: a NULL input array yields `array(null, ..., null)` (the
  * outer `array(...)` of per-lane null `array_min` results is itself
  * non-null), null elements are skipped exactly as `array_min` skips
  * them, and an empty (or all-null) input also yields a lane of nulls.
  * The expression is therefore never null. The difference is cost: the
  * HOF tree repeats the base-hash subexpression once per lane and
  * allocates one intermediate array per lane per row, which made
  * signature computation the dominant cost of BOTH the batch LSH plan
  * and the streaming per-trigger path (round-8 probe: ~1 ms/doc; this
  * kernel is one tight loop, no per-lane allocation).
  */
case class MinhashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint> input, got ${other.catalogString}")
  }

  @transient private lazy val laneRots: Array[Int] =
    MinhashSig.lanes(numHashes)._1
  @transient private lazy val laneMasks: Array[Long] =
    MinhashSig.lanes(numHashes)._2

  override def eval(input: InternalRow): Any = {
    val value = child.eval(input)
    if (value == null) return new GenericArrayData(new Array[Any](numHashes))
    val arr = value.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val rots = laneRots
    val masks = laneMasks
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var seen = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen += 1
        val h = arr.getLong(i)
        var k = 0
        while (k < numHashes) {
          val v = java.lang.Long.rotateLeft(h, rots(k)) ^ masks(k)
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    if (seen == 0) new GenericArrayData(new Array[Any](numHashes))
    else new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val a = childGen.value
    val rots = ctx.addReferenceObj("minhashRots", laneRots, "int[]")
    val masks = ctx.addReferenceObj("minhashMasks", laneMasks, "long[]")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val k = ctx.freshName("k")
    val h = ctx.freshName("h")
    val v = ctx.freshName("v")
    val mins = ctx.freshName("mins")
    val seen = ctx.freshName("seen")
    val gad = classOf[GenericArrayData].getName
    ev.copy(code =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value};
         |if (${childGen.isNull}) {
         |  ${ev.value} = new $gad(new Object[$numHashes]);
         |} else {
         |  final int $n = $a.numElements();
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  int $seen = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      $seen++;
         |      final long $h = $a.getLong($i);
         |      for (int $k = 0; $k < $numHashes; $k++) {
         |        final long $v = Long.rotateLeft($h, $rots[$k]) ^ $masks[$k];
         |        if ($v < $mins[$k]) $mins[$k] = $v;
         |      }
         |    }
         |  }
         |  ${ev.value} = ($seen == 0)
         |    ? new $gad(new Object[$numHashes])
         |    : new $gad($mins);
         |}
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  /** Lane constants (rotation, xor-mask) for `numHashes` permutation
    * lanes — the SINGLE derivation shared by this kernel and the HOF
    * anchor formulation, so both stay bit-identical forever. */
  def lanes(numHashes: Int): (Array[Int], Array[Long]) = {
    val rng = new scala.util.Random(0x5eed)
    val rots = new Array[Int](numHashes)
    val masks = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      rots(k) = 1 + rng.nextInt(62)
      masks(k) = rng.nextLong()
      k += 1
    }
    (rots, masks)
  }
}
