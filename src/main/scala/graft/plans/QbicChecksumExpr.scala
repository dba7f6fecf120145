package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for the QBiC barcode checksum (SURVEY §2.8 F3;
  * algorithm register-iontorrent-data.py:79-94): weighted ord-sum of the
  * first 9 chars mod 34, mapped to 0-9A-X. Called from both interpreted
  * eval and generated Java (static forwarder), so the two paths cannot
  * diverge. */
object ChecksumUtil {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = math.min(9, str.length)
    var sum = 0
    var i = 0
    while (i < n) { sum += str.charAt(i).toInt * (i + 1); i += 1 }
    val v = sum % 34
    val c = if (v < 10) ('0' + v).toChar else ('A' + v - 10).toChar
    UTF8String.fromString(c.toString)
  }
}

/** Native Catalyst expression computing the barcode checksum char.
  *
  * The pure-column formulation ([[graft.functions.Barcode.checksumChar]])
  * expands to 9 ascii/substring/when nodes; this single expression keeps
  * the hot validation path one codegen'd call deep — the preferred shape
  * when a predicate runs inside a 100 TB scan.
  */
case class QbicChecksum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qbic_checksum requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "qbic_checksum"

  override protected def nullSafeEval(input: Any): Any =
    ChecksumUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ChecksumUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): QbicChecksum =
    copy(child = newChild)
}

object QbicChecksum {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[QbicChecksum].getName, "qbic_checksum")
}
