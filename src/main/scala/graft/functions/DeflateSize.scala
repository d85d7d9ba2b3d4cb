package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE worker behind [[DeflateSize]] — a standalone object, so
  * Scala emits static forwarders and generated Java can call
  * `graft.functions.DeflateHelper.size(bytes)` directly. */
object DeflateHelper {
  /** Fixed compression level: determinism of the byte count rests on
    * (input, level, zlib build); the JVM bundles zlib, so within one
    * cluster image the count is a pure function of the input. */
  final val Level = 6

  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Size in bytes of the raw-DEFLATE stream (no zlib/gzip header — the
    * header would add a constant that dilutes the ratio on short docs). */
  def size(bytes: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(Level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val b = buf.get()
      var total = 0
      while (!d.finished()) total += d.deflate(b)
      total
    } finally d.end()
  }
}

/** Codegen'd DEFLATE-compressed byte count of a string/binary column —
  * the compression-ratio quality signal of Gopher/RefinedWeb-style
  * corpus filters (highly repetitive or template text compresses far
  * below natural prose; near-random text barely compresses). The
  * expression returns the compressed SIZE; callers derive the ratio as
  * `deflate_size / octet_length` so both terms stay visible for audit.
  *
  * Runs per-row inside whole-stage codegen as one static call — no UDF
  * wrapper, no serialization of the row to Scala. Not SQL-expressible
  * in DuckDB, so queries built on it pin a golden oracle. */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"deflate_size requires string or binary input, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => DeflateHelper.size(s.getBytes)
    case b: Array[Byte] => DeflateHelper.size(b)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => child.dataType match {
      case StringType => s"graft.functions.DeflateHelper.size($c.getBytes())"
      case _ => s"graft.functions.DeflateHelper.size($c)"
    })

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}
