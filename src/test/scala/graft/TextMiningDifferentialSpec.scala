package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextMining

/** Differential test for the M11 pipeline: 150 seeded-random documents
  * built from a vocabulary of words, sign words, numbers, values,
  * years, units and punctuation run through `TextMining.mine` AND an
  * independent plain-Scala re-implementation of
  * texteExtract.py:95-129's semantics; outputs must agree exactly.
  * This covers association totality (every value maps to exactly one
  * year-or-NAN), the strictly-following rule, the 25-token sign
  * window, and multi-token values — on inputs no hand fixture would
  * think of. */
class TextMiningDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ValueRe = "^[0-9]+(,[0-9]+)?%$".r
  private val NumRe = "^[0-9]+(,[0-9]+)?$".r
  private val YearRe = "^[0-9]{4}$".r
  private val units = Set("millions", "dollars", "bbl", "%", "$")
  private val plus = Set("hausse", "augmentation", "appreciation", "excedent", "accroissement")
  private val minus = Set("baisse", "diminution", "deficit")

  /** Independent reference implementation (kept deliberately naive —
    * nested loops, like the Python original). */
  private def refMine(text: String): Map[String, Seq[String]] = {
    val out = scala.collection.mutable.Map.empty[String, Vector[String]]
    for (sentence <- text.split(" [.!?]+ ", -1)) {
      val toks = sentence.split(" ", -1)
      // values with inclusive (start, end) 1-based positions
      val values = toks.zipWithIndex.flatMap { case (t, i0) =>
        val p = i0 + 1
        if (ValueRe.findFirstIn(t).isDefined) Some((p, p, t))
        else if (NumRe.findFirstIn(t).isDefined && i0 + 1 < toks.length
          && units.contains(toks(i0 + 1))) Some((p, p + 1, s"$t ${toks(i0 + 1)}"))
        else None
      }
      val years = toks.zipWithIndex.collect {
        case (t, i0) if YearRe.findFirstIn(t).isDefined => (i0 + 1, t)
      }
      for ((vPos, vEnd, vText) <- values) {
        val following = years.filter(_._1 > vEnd)
        val year =
          if (following.isEmpty) "NAN"
          else following.minBy(y => (y._1 - vEnd, y._2))._2
        val ctx = toks.zipWithIndex.collect {
          case (t, i0) if (plus.contains(t) || minus.contains(t))
            && i0 + 1 >= vPos - 25 && i0 + 1 <= vPos - 1 => (i0 + 1, t)
        }
        val sign =
          if (ctx.isEmpty) ""
          else {
            val w = ctx.minBy(c => vPos - c._1)._2
            if (plus.contains(w)) "+" else "-"
          }
        out(year) = out.getOrElse(year, Vector.empty) :+ (sign + vText)
      }
    }
    out.view.mapValues(_.sorted.toSeq).toMap
  }

  test("mine() agrees with the independent reference on 150 random docs") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector(
      "le", "rapport", "une", "hausse", "baisse", "deficit", "mot", "taux",
      "3%", "12,5%", "7", "42", "1999", "2021", "450", "millions", "dollars",
      "croissance", "augmentation", ".", "!", "?", "stable", "en", "de", "bbl")
    val docs = (1L to 150L).map { id =>
      val n = 5 + rnd.nextInt(36)
      (id, (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val sparkOut = TextMining.mine(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    val refOut = docs.flatMap { case (id, text) =>
      refMine(text).map { case (year, vals) => (id, year) -> vals.mkString(",") }
    }.toMap
    assert(sparkOut.keySet === refOut.keySet)
    refOut.foreach { case (k, v) =>
      assert(sparkOut(k) === v, s"doc/year $k: text=${docs(k._1.toInt - 1)._2}")
    }
  }
}
