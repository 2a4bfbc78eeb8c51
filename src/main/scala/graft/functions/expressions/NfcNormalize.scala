package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization as a native scan-side expression — the first
 * stage of corpus text cleaning (CCNet-style normalize → lowercase →
 * collapse whitespace; [[graft.functions.Text.cleaned]] composes the
 * rest from codegen'd built-ins). Spark has no normalization built-in;
 * a Scala UDF here would break whole-stage codegen on the hottest
 * full-corpus scan of the pipeline, so this is an `Expression` with
 * `doGenCode` like the other graft kernels.
 *
 * Fast path: `Normalizer.isNormalized` (a scan, no allocation) skips the
 * rebuild for already-NFC text — the overwhelmingly common case in real
 * corpora — so the kernel costs one pass per clean row.
 *
 * Oracle contract: `java.text.Normalizer.normalize(s, NFC)` and DuckDB's
 * `nfc_normalize` both implement UAX #15 canonical composition —
 * bit-identical output for any input.
 */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.NfcUtil$$.MODULE$$.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Compiled NFC kernel shared by interpreted eval and generated code. */
object NfcUtil {
  import java.text.Normalizer

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
