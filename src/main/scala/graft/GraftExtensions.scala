package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.expressions.{CosineSimilarity, HammingDistance}

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
  }
}
