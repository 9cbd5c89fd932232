package graft.operators

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property check for the bounded per-query heap the whole ANN family's
  * exactness rests on: for ANY input and ANY k, the heap's survivors
  * must be exactly the k best rows per query that a full sort-and-take
  * would select (same multiset — order within the partition is
  * irrelevant, the downstream ranking window re-sorts). Runs under
  * sbt's native ScalaCheck framework like GeomPropertySpec. */
object BoundedTopKSpec extends Properties("BoundedTopK") {

  private val rowGen: Gen[(Long, Long, Long)] = for {
    qid <- Gen.choose(0L, 5L)
    cid <- Gen.choose(0L, 50L) // small domain → frequent ties/duplicates
    score <- Gen.choose(-20L, 20L)
  } yield (qid, cid, score)

  // the window's order: score ASC then cid ASC (adcRankOrder's shape)
  private val ord: Ordering[(Long, Long, Long)] =
    Ordering.fromLessThan { (x, y) =>
      x._3 < y._3 || (x._3 == y._3 && x._2 < y._2)
    }

  property("survivors equal sort-and-take per query") =
    forAll(Gen.listOf(rowGen), Gen.choose(1, 12)) { (rows, k) =>
      val got = BoundedTopK
        .perQuery(rows.iterator, k, (r: (Long, Long, Long)) => r._1)(ord)
        .toSeq
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        rs.sorted(ord).take(k)
      }
      // compare as sorted sequences (multisets): the heap emits in
      // arbitrary order, and equal-key duplicates make Sets lossy
      Prop(got.sorted == expected.sorted) :| s"k=$k rows=$rows got=$got"
    }

  property("emits ≤ k rows per query and never invents rows") =
    forAll(Gen.listOf(rowGen), Gen.choose(1, 5)) { (rows, k) =>
      val got = BoundedTopK
        .perQuery(rows.iterator, k, (r: (Long, Long, Long)) => r._1)(ord)
        .toSeq
      val bounded = got.groupBy(_._1).forall { case (_, rs) => rs.size <= k }
      val pool = rows.groupBy(identity).view.mapValues(_.size).toMap
      val honest = got.groupBy(identity).forall { case (r, dups) =>
        pool.getOrElse(r, 0) >= dups.size
      }
      Prop(bounded && honest) :| s"k=$k rows=$rows got=$got"
    }
}
