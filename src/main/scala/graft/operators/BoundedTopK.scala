package graft.operators

import scala.collection.mutable

/** Bounded per-query top-k selection applied INSIDE a scan partition.
  *
  * The ANN kernels (x3/x14/x15/x38/x39/x40/x42) score candidates against a
  * small broadcast query batch and then pick each query's k best rows with
  * `row_number() OVER (PARTITION BY query_id)`. Left unbounded, that window
  * funnels the ENTIRE scored set into one reducer per query key — at 100 TB
  * each of the ~10 reducers sorts billions of rows, the classic
  * full-shuffle-on-a-skewed-key straggler. Keeping a k-bounded heap per
  * query inside the existing `mapPartitions` kernel caps the window's input
  * at partitions × queries × k rows instead of the corpus size.
  *
  * Exactness is preserved: the heap evicts under the SAME total order the
  * window ranks by ((score, cand_id) — a total order because cand_id is
  * unique per query within a scan), so any row in the global top-k is
  * necessarily in its partition's top-k and survives to the window, which
  * then produces bit-identical ranks.
  */
object BoundedTopK {

  /** Filters `rows` down to at most `k` rows per query, where `ord` is the
    * window's ranking order (LOWEST = rank 1). Single pass, O(k) memory per
    * distinct query in the partition (the query batch is broadcast-small by
    * construction), O(log k) per candidate.
    */
  def perQuery[R](rows: Iterator[R], k: Int, queryOf: R => Long)(
      implicit ord: Ordering[R]): Iterator[R] = {
    require(k >= 1, s"k must be positive, got $k")
    // PriorityQueue is a max-heap: head = WORST kept row under `ord`
    val heaps = mutable.LongMap.empty[mutable.PriorityQueue[R]]
    rows.foreach { r =>
      val h = heaps.getOrElseUpdate(queryOf(r), mutable.PriorityQueue.empty[R](ord))
      if (h.size < k) h.enqueue(r)
      else if (ord.lt(r, h.head)) { h.dequeue(); h.enqueue(r) }
    }
    heaps.valuesIterator.flatMap(_.iterator)
  }
}
