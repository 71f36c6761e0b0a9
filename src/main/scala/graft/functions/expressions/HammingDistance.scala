package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hamming_distance(string, string) -> bigint` as a native Catalyst
  * expression with whole-stage codegen (custom piece #2; same ladder
  * as [[CosineSimilarity]]): the number of positions at which the two
  * strings differ, counted over the common prefix, plus the length
  * difference. Over SimHash/sign-bit fingerprints this is the bit
  * distance that gates near-duplicate candidates.
  *
  * Byte-wise comparison (exact for the ASCII '0'/'1' fingerprint
  * alphabet and consistent with DuckDB's `hamming` on equal-length
  * ASCII strings); total on unequal lengths rather than erroring so
  * filters stay null-safe.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hamming_distance requires (string, string), got ($l, $r)")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "hamming_distance"

  private def compute(a: UTF8String, b: UTF8String): Long = {
    val xs = a.getBytes
    val ys = b.getBytes
    val n = math.min(xs.length, ys.length)
    var d = math.abs(xs.length - ys.length).toLong
    var i = 0
    while (i < n) { if (xs(i) != ys(i)) d += 1; i += 1 }
    d
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |byte[] $xs = $a.getBytes();
         |byte[] $ys = $b.getBytes();
         |int $n = Math.min($xs.length, $ys.length);
         |long $d = Math.abs($xs.length - $ys.length);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($xs[$i] != $ys[$i]) $d++;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}
