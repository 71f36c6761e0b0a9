package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.expressions.{CosineSimilarity, HammingDistance, JaroWinkler, UnicodeNormalize}

/** Engine extension point (SparkSessionExtensions): registers the
  * native expressions so SQL users get them as built-ins
  * (`SELECT cosine_similarity(a, b)`). Installed by GraftSession;
  * external apps can also set
  * `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("hamming_distance"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming_distance"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HammingDistance(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler_similarity"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler_similarity"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        JaroWinkler(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // the form is a plan-time constant: require a foldable string
        // literal so an invalid form fails analysis, not execution
        val form = children.lift(1) match {
          case Some(e) if e.foldable && e.dataType == org.apache.spark.sql.types.StringType =>
            e.eval(null).toString
          case None => "NFC"
          case _ => throw new IllegalArgumentException(
            "unicode_normalize(str, form): form must be a string literal")
        }
        UnicodeNormalize(children.head, form)
      }))
  }
}
