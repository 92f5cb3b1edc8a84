package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization kernel shared by eval and codegen:
  * NFD-decompose, drop combining marks (Mn), NFC-recompose. Composed with
  * `lower` + whitespace collapse it is the stage-0 text normalization every
  * dedup pipeline runs before hashing (case/diacritic near-misses collapse
  * to one fingerprint). Matches DuckDB `strip_accents(nfc_normalize(...))`
  * on canonical input.
  */
object TextNormUtil {
  def strip(s: UTF8String): UTF8String = {
    val str = s.toString
    // ASCII fast path — the overwhelmingly common case at corpus scale:
    // nothing to decompose, return the input buffer untouched
    var ascii = true
    var i = 0
    while (ascii && i < str.length) {
      if (str.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val de = java.text.Normalizer.normalize(str,
        java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(de.length)
      var j = 0
      while (j < de.length) {
        val c = de.charAt(j)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        j += 1
      }
      UTF8String.fromString(java.text.Normalizer.normalize(sb.toString,
        java.text.Normalizer.Form.NFC))
    }
  }
}

/** Native codegen'd expression wrapping TextNormUtil.strip — stays inside
  * whole-stage codegen (a Scala UDF here would box every row and break the
  * codegen span around the downstream hash). */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"strip_accents requires a string argument, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    TextNormUtil.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormUtil.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object TextNormExprs {
  /** strip_accents(s): NFC(drop-Mn(NFD(s))), codegen'd. */
  def stripAccents(c: Column): Column =
    GraftBridge.column(StripAccents(GraftBridge.expression(c)))
}
