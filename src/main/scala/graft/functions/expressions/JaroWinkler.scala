package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `jaro_winkler_similarity(string, string) -> double` as a native
  * Catalyst expression with whole-stage codegen (custom piece #4; the
  * [[CosineSimilarity]]/[[HammingDistance]] ladder) — the fuzzy-match
  * scorer that weights agreement by position and shared prefix, the
  * standard name/title matcher where `levenshtein` over-penalizes
  * transposed characters.
  *
  * The arithmetic mirrors the rapidfuzz formulation (the
  * implementation DuckDB embeds) OPERATION FOR OPERATION so the value
  * is bit-identical to DuckDB's `jaro_winkler_similarity` and the
  * oracle gate can compare raw doubles:
  *
  *  - matching window `max(len1, len2) / 2 - 1` (floored at 0);
  *    greedy flagging iterates the SECOND string and takes the
  *    lowest unflagged in-window position of the first;
  *  - transpositions = (# mismatched flagged positions) / 2, integer
  *    floor;
  *  - `sim = (m/l1 + m/l2 + (m - t)/m) / 3` accumulated left to
  *    right, each term one IEEE division;
  *  - Winkler boost only when `sim > 0.7`:
  *    `sim += prefix * 0.1 * (1 - sim)` with prefix capped at 4.
  *
  * Byte-wise comparison (DuckDB's jaro also walks UTF-8 bytes), so
  * scores are exact for ASCII and consistent-with-DuckDB for
  * anything else. Codegen emits one static call — the loop stays
  * compiled, the expression stays inside the enclosing
  * WholeStageCodegen span.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler_similarity requires (string, string), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler_similarity"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.JaroWinkler.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static entry point shared by interpreted eval and generated code
    * (the companion's static forwarder keeps the call codegen-legal). */
  def similarity(aU: UTF8String, bU: UTF8String): Double = {
    val p = aU.getBytes
    val t = bU.getBytes
    if (p.length == 0 && t.length == 0) return 1.0
    if (p.length == 0 || t.length == 0) return 0.0
    var prefix = 0
    val maxPrefix = math.min(math.min(p.length, t.length), 4)
    while (prefix < maxPrefix && p(prefix) == t(prefix)) prefix += 1
    var sim = jaro(p, t)
    if (sim > 0.7) sim += prefix.toDouble * 0.1 * (1.0 - sim)
    sim
  }

  private def jaro(p: Array[Byte], t: Array[Byte]): Double = {
    val lp = p.length
    val lt = t.length
    if (lp == 1 && lt == 1) return if (p(0) == t(0)) 1.0 else 0.0
    val bound = math.max(math.max(lp, lt) / 2 - 1, 0)
    val pFlag = new Array[Boolean](lp)
    val tFlag = new Array[Boolean](lt)
    var m = 0
    var j = 0
    while (j < lt) {
      val lo = math.max(0, j - bound)
      val hi = math.min(lp - 1, j + bound)
      var i = lo
      var found = false
      while (i <= hi && !found) {
        if (!pFlag(i) && p(i) == t(j)) {
          pFlag(i) = true; tFlag(j) = true; m += 1; found = true
        }
        i += 1
      }
      j += 1
    }
    if (m == 0) return 0.0
    // flagged sequences are the same multiset paired by the matching;
    // transpositions = positional mismatches between them, halved
    var mismatches = 0
    var ip = 0
    var it = 0
    while (it < lt) {
      if (tFlag(it)) {
        while (!pFlag(ip)) ip += 1
        if (p(ip) != t(it)) mismatches += 1
        ip += 1
      }
      it += 1
    }
    val trans = mismatches / 2
    var sim = 0.0
    sim += m.toDouble / lp
    sim += m.toDouble / lt
    sim += (m.toDouble - trans.toDouble) / m
    sim / 3.0
  }
}
