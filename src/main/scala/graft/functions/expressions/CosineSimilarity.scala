package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `cosine_similarity(array<float>, array<float>) -> double` as a
  * native Catalyst expression with whole-stage codegen (SURVEY §4
  * custom piece #1; builder preference order: built-ins < custom
  * Expression < UDF).
  *
  * Against a Scala UDF this avoids per-row serialization to Scala
  * types and keeps the loop inside the generated Java of the enclosing
  * stage; against the decimal HOF path (`operators/Similarity`) it
  * trades bit-exact reproducibility for one fused float loop — use
  * this form in scoring/filtering paths, the decimal form when results
  * must be partition-order independent to the last bit.
  *
  * Zero-magnitude vectors score 0.0 (not NaN) so the expression is
  * total; mismatched lengths score over the common prefix.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity requires (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_similarity"

  private def compute(xs: Array[Float], ys: Array[Float]): Double = {
    val n = math.min(xs.length, ys.length)
    var dot = 0d; var na = 0d; var nb = 0d
    var i = 0
    while (i < n) {
      dot += xs(i).toDouble * ys(i)
      na += xs(i).toDouble * xs(i)
      nb += ys(i).toDouble * ys(i)
      i += 1
    }
    if (na == 0d || nb == 0d) 0d else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |float[] $xs = $a.toFloatArray();
         |float[] $ys = $b.toFloatArray();
         |int $n = Math.min($xs.length, $ys.length);
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $xs[$i]) * $ys[$i];
         |  $na  += ((double) $xs[$i]) * $xs[$i];
         |  $nb  += ((double) $ys[$i]) * $ys[$i];
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
