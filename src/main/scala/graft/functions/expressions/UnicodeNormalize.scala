package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `unicode_normalize(string, 'NFC'|'NFD'|'NFKC'|'NFKD') -> string` as
  * a native Catalyst expression — the corpus-prep normalization pass
  * every training pipeline runs before tokenization and dedup
  * (a decomposed `e`+U+0301 and a precomposed `é` must shingle, hash
  * and deduplicate identically). No Spark built-in exposes
  * `java.text.Normalizer`, so by the builder preference order this is
  * a codegen'd expression, not a UDF: the generated code calls the JDK
  * normalizer directly inside the enclosing stage — no closure
  * serialization, no row-level Scala dispatch.
  *
  * The form is fixed at plan time (a constructor argument resolved
  * from a literal by the registration builder), so an invalid form
  * fails analysis, not execution. Null in → null out. Already-
  * normalized ASCII fast-paths inside the JDK (`isNormalized`).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val javaForm: Normalizer.Form = form.toUpperCase match {
    case "NFC" => Normalizer.Form.NFC
    case "NFD" => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"unicode_normalize: unknown form '$other' (NFC|NFD|NFKC|NFKD)")
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires a string column, got $t")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, javaForm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formName = javaForm.name()
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($s.toString(),
         |    java.text.Normalizer.Form.$formName));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
