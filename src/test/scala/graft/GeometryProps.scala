package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.Geometry
import graft.functions.Geometry.Box

/** ScalaCheck properties for IoU and greedy NMS (SURVEY.md §5.3). */
object GeometryProps extends Properties("Geometry") {

  private val coord = Gen.chooseNum(0d, 100d)
  private val genBox: Gen[Box] = for {
    x1 <- coord; y1 <- coord
    w <- Gen.chooseNum(0.1d, 50d); h <- Gen.chooseNum(0.1d, 50d)
  } yield Box(x1, y1, x1 + w, y1 + h)

  private val genScored: Gen[List[(Long, Box, Double)]] =
    Gen.listOfN(12, genBox).flatMap { boxes =>
      Gen.listOfN(boxes.size, Gen.chooseNum(0d, 1d)).map { scores =>
        boxes.zip(scores).zipWithIndex.map { case ((b, s), i) => (i.toLong, b, s) }
      }
    }

  property("iou is within [0, 1]") = forAll(genBox, genBox) { (a, b) =>
    val v = Geometry.iou(a, b)
    v >= 0d && v <= 1d
  }

  property("iou is symmetric") = forAll(genBox, genBox) { (a, b) =>
    Geometry.iou(a, b) == Geometry.iou(b, a)
  }

  property("iou(b, b) == 1 for positive-area boxes") = forAll(genBox) { b =>
    Geometry.iou(b, b) == 1d
  }

  property("nms output ids are a subset of the input ids") =
    forAll(genScored) { boxes =>
      val kept = Geometry.nms(boxes).toSet
      kept.subsetOf(boxes.map(_._1).toSet)
    }

  property("nms survivors are pairwise below the iou threshold") =
    forAll(genScored) { boxes =>
      val thr = 0.1
      val byId = boxes.map(b => b._1 -> b._2).toMap
      val kept = Geometry.nms(boxes, thr).map(byId)
      Prop(kept.combinations(2).forall {
        case Seq(a, b) => Geometry.iou(a, b) <= thr
        case _ => true
      })
    }

  property("nms never exceeds maxOutputSize") =
    forAll(genScored, Gen.chooseNum(1, 5)) { (boxes, cap) =>
      Geometry.nms(boxes, maxOutputSize = cap).size <= cap
    }

  property("every suppressed box overlaps some higher-priority survivor") =
    forAll(genScored) { boxes =>
      val thr = 0.1
      val kept = Geometry.nms(boxes, thr)
      val keptSet = kept.toSet
      val byId = boxes.map(b => b._1 -> b._2).toMap
      Prop(boxes.forall { case (id, box, _) =>
        keptSet.contains(id) || kept.exists(k => Geometry.iou(box, byId(k)) > thr)
      })
    }
}
