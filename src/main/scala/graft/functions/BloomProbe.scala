package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a BROADCAST Bloom filter — the
  * r11 verdict called this probe "the one legitimately stuck as a
  * UDF" (Spark's own BloomFilterMightContain is not public API); it
  * is not stuck: the expression carries only the Broadcast HANDLE
  * (bytes ship once per executor through the block manager, exactly
  * as the UDF's closure capture did) and the generated code is one
  * virtual call into the sketch, so the decontamination prefilter's
  * map-side projection stays inside whole-stage codegen instead of
  * paying the ScalaUDF conversion tax per shingle — and shingles are
  * the highest-cardinality stream in the engine (every n-gram of
  * every training document flows through this probe).
  *
  * NULL input probes FALSE (a null shingle cannot match the
  * benchmark), matching the UDF-era contract; the expression itself
  * is never null. */
case class BloomMightContain(child: Expression,
                             bc: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires string input, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && bc.value.mightContainString(
      v.asInstanceOf[UTF8String].toString)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val bcRef = ctx.addReferenceObj("bloomBc", bc,
      classOf[Broadcast[BloomFilter]].getName)
    ev.copy(code =
      code"""
         |${childGen.code}
         |boolean ${ev.value} = !${childGen.isNull} &&
         |  ((org.apache.spark.util.sketch.BloomFilter) $bcRef.value())
         |    .mightContainString(${childGen.value}.toString());
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column face: probe `c` against the broadcast filter. */
  def column(c: Column, bc: Broadcast[BloomFilter]): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(BloomMightContain(ColumnShim.expression(c), bc))
  }
}
