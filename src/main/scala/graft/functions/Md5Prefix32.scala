package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the first 4 bytes of md5(input) as an
  * unsigned 32-bit value in a LONG — semantically identical to
  * `conv(substring(md5(s), 1, 8), 16, 10)` but one fused operation
  * instead of three (no hex-string materialization, no conv parse). Used
  * in the MinHash/SimHash inner loops where it runs once per
  * (shingle × hash-function).
  *
  * Codegen calls a static helper, so the expression stays inside
  * whole-stage codegen (no CodegenFallback row boxing).
  */
case class Md5Prefix32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix32 expects STRING, got ${child.dataType.sql}")
  }
  override def prettyName: String = "md5_prefix32"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix32.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Prefix32.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix32 =
    copy(child = newChild)
}

object Md5Prefix32 {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** first 4 md5 digest bytes, big-endian, as unsigned long */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Column API (Spark 4 classic bridge) */
  def md5_prefix32(c: Column): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(Md5Prefix32(Bridge.expression(c)))
  }
}
