package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for Unicode NFC normalization. Called from both
  * interpreted eval and generated Java (static forwarder), so the two
  * paths cannot diverge. The `isNormalized` fast path skips the
  * allocation for the overwhelmingly-common already-composed input —
  * on an ASCII-heavy 100 TB corpus the kernel is then a scan, not a
  * rewrite. */
object NfcUtil {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Native Catalyst expression for Unicode NFC normalization — the text-
  * cleanup step every dedup/fingerprint pipeline needs before hashing
  * (decomposed `e`+U+0301 and composed `é` must hash identically).
  * Spark has no built-in for this; a Scala UDF would break whole-stage
  * codegen in the scan stage where normalization runs, so this is a
  * codegen'd UnaryExpression like [[QbicChecksum]].
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcUtil.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcUtil.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NfcNormalize].getName, "nfc_normalize")
}
