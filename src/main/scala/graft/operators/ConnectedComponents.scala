package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star /
  * small-star contraction (Kiveris et al., "Connected Components in
  * MapReduce and Beyond") — the skew-robust alternative to min-label
  * propagation for the duplicate-cluster graphs of a dedup pipeline
  * (x16). Propagation needs O(component diameter) rounds, which is fine
  * for blob-shaped near-dup clusters but degenerates on chain-shaped
  * components (each round moves the label one hop); star contraction
  * converges in O(log² n) rounds regardless of shape, with every round a
  * pair of shuffle-by-node aggregations — the same per-round cost, a
  * bounded round count.
  *
  * Both operators return the identical labeling (min node id per
  * component), so they share the x16 recursive-CTE oracle.
  */
object ConnectedComponents {

  /** Session-unique suffix for per-round Observation names. */
  private val sketchEpoch = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Edge-count ceiling for the SINGLE-TASK finish (r15 optimization):
    * below it the whole labeling runs as one union-find task instead of
    * O(log² n) contraction rounds — each distributed round costs 4
    * shuffles + a lineage break, pure fixed overhead once the edge set
    * fits one task. Scale-adaptive, not local-mode-tuned: the decision
    * reads the measured edge count (which the convergence sketch already
    * computes), so a 100 TB corpus whose near-dup graph has billions of
    * edges takes the distributed rounds and a contracted/small graph
    * finishes in one task — the same escalation MLlib-style graph
    * libraries apply. 2 M edges ≈ 32 MB of (long,long) plus the
    * union-find arrays ≈ 80 MB task memory, well inside an executor.
    * Conf `graft.cc.localEdgeLimit`; <= 0 disables (forces the
    * distributed rounds — the chaos/soak arms pin those). */
  private[graft] def localEdgeLimit(spark: SparkSession): Long = {
    val confKey = "graft.cc.localEdgeLimit"
    val raw = spark.conf.get(confKey, "2000000")
    scala.util.Try(raw.trim.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"$confKey must be a long, got '$raw'"))
  }

  /** Single-task min-label union-find over an edge iterator: returns
    * (node, min id of its component) for every distinct endpoint.
    * Index-based with path halving — arrays, not boxed maps, so the
    * 2 M-edge ceiling costs ~80 MB. Union attaches the larger-id root
    * under the smaller ⇒ every tree root IS its component minimum (the
    * same invariant the ConnectedComponentsSpec ground truth uses). */
  private[graft] def localMinLabels(
      it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    var us = new Array[Long](1024)
    var vs = new Array[Long](1024)
    var m = 0
    while (it.hasNext) {
      val (u, v) = it.next()
      if (m == us.length) {
        us = java.util.Arrays.copyOf(us, m * 2)
        vs = java.util.Arrays.copyOf(vs, m * 2)
      }
      us(m) = u; vs(m) = v; m += 1
    }
    if (m == 0) return Iterator.empty
    // distinct endpoints, ascending — index order = id order
    val nodes = new Array[Long](2 * m)
    System.arraycopy(us, 0, nodes, 0, m)
    System.arraycopy(vs, 0, nodes, m, m)
    java.util.Arrays.sort(nodes)
    var n = 1
    var i = 1
    while (i < 2 * m) {
      if (nodes(i) != nodes(n - 1)) { nodes(n) = nodes(i); n += 1 }
      i += 1
    }
    def idx(x: Long): Int = {
      val p = java.util.Arrays.binarySearch(nodes, 0, n, x)
      p // endpoints are in `nodes` by construction
    }
    val parent = Array.tabulate(n)(identity)
    def find(s: Int): Int = {
      var x = s
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    i = 0
    while (i < m) {
      val (ra, rb) = (find(idx(us(i))), find(idx(vs(i))))
      if (ra != rb) {
        // min index = min id: keep the smaller root
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
      i += 1
    }
    Iterator.tabulate(n)(j => (nodes(j), nodes(find(j))))
  }

  /** Labels every node of the undirected edge list with its component's
    * minimum node id. Input: two columns (u, v); self-loops ignored.
    * Output: (node, root). Fails loudly if `maxIter` rounds don't
    * converge rather than returning an under-merged clustering. */
  def starContract(spark: SparkSession, edgesIn: DataFrame,
      maxIter: Int = 32): DataFrame =
    starContractWithRounds(spark, edgesIn, maxIter)._1

  /** [[starContract]] plus the number of contraction rounds it took —
    * the soak pins this against the O(log² n) bound (in practice
    * ~log₂ n + small constant even on chain graphs). */
  def starContractWithRounds(spark: SparkSession, edgesIn: DataFrame,
      maxIter: Int = 32): (DataFrame, Int) = {
    val cols = edgesIn.columns
    require(cols.length == 2, s"edge list needs 2 columns, got ${cols.length}")
    // orient big → small; drop self-loops; dedup
    val e0Plan = edgesIn.select(
        greatest(col(cols(0)), col(cols(1))).as("u"),
        least(col(cols(0)), col(cols(1))).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    // round state lives across the whole contraction loop — stable
    // lineage break, strategy LATCHED for the loop and superseded
    // rounds freed as it advances (Checkpoints.Loop; keep=2 because
    // the exceptAll fixpoint check below reads round k beside round
    // k+1). `nodes` is loop-invariant → plain stable, never rotated.
    val loop = new Checkpoints.Loop(spark, keep = 2)
    // commutative 64-bit fingerprint + count of an edge set — bit_xor,
    // not sum: ANSI mode throws on long overflow, and xor of
    // distinct-edge hashes is an equally good commutative fingerprint
    val sketchExprs = Seq(
      coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h"),
      count(lit(1)).as("n"))
    // the initial sketch rides the e0 checkpoint materialization (one
    // job, not a separate agg) — same single-fire contract as the
    // per-round sketches below
    val obs0 = org.apache.spark.sql.Observation(
      s"cc_sketch_${sketchEpoch.incrementAndGet()}")
    val e0 = loop.stable(
      e0Plan.observe(obs0, sketchExprs.head, sketchExprs.tail: _*))
    var edgeSketch = {
      val om = obs0.get
      (om("h").asInstanceOf[Long], om("n").asInstanceOf[Long])
    }

    // single-task finish (see [[localEdgeLimit]]): the measured edge
    // count fits one task ⇒ union-find in one mapPartitions, zero
    // contraction rounds. Long-keyed graphs only (every engine caller —
    // doc/vec ids); other key types keep the distributed rounds.
    val longKeys = e0.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    val limit = localEdgeLimit(spark)
    if (longKeys && limit > 0 && edgeSketch._2 <= limit) {
      import spark.implicits._
      val labels = e0.as[(Long, Long)]
        .coalesce(1)
        .mapPartitions(localMinLabels)
        .toDF("node", "root")
      return (labels, 0)
    }

    // nodes that appear at all (isolated nodes are the caller's concern)
    val nodes = Checkpoints.stable(e0.select(col("u").as("node"))
      .union(e0.select(col("v").as("node")))
      .distinct())

    var edges = e0
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // -- large-star: for every node, link all LARGER neighbors to the
      // minimum of its closed neighborhood. Neighborhoods come from the
      // symmetric closure; one shuffle by node for the min, one for the
      // join back.
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      // no distinct here: duplicate (v, m) rows don't change the next
      // aggregation's minima, and dropping the dedup saves a full
      // shuffle per round; small-star's groupBy absorbs them
      val large = sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
      // -- small-star: edges are now oriented big → small; link every
      // smaller neighbor (and the node itself) to the neighborhood min.
      val smallMins = large.groupBy(col("u"))
        .agg(min(col("v")).as("m"))
      // the fingerprint rides the checkpoint materialization via a
      // CollectMetrics node — zero extra jobs per round (x16's
      // pattern). Single-fire on BOTH strategies: the reliable path's
      // persist bracket (Checkpoints.stableAs) keeps the checkpoint-
      // write job reading cached blocks, so the metrics never
      // accumulate a second execution (bit_xor would self-cancel —
      // ADVICE r13; spec-pinned in ConnectedComponentsSpec).
      val obs = org.apache.spark.sql.Observation(
        s"cc_sketch_${sketchEpoch.incrementAndGet()}")
      val small = large.join(smallMins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(smallMins.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
        .observe(obs, sketchExprs.head, sketchExprs.tail: _*)
        .transform(loop.stable(_))
      val om = obs.get
      val newSketch = (om("h").asInstanceOf[Long], om("n").asInstanceOf[Long])
      // -- converged ⟺ edge-set FIXPOINT (the paper's condition). A
      // structural "no chains" test is NOT sufficient: a node can hold
      // two parents from different small-star groups (e.g. edges
      // (6,5),(6,0),(7,5),(7,1) → {(5,0),(6,0),(5,1),(7,1)}, chain-free
      // but under-merged); only a full round that changes nothing
      // certifies stars. Detection is two-tier: a commutative
      // count+hash sketch every round (cheap agg, no extra shuffle),
      // and ONE exact exceptAll confirmation when the sketch matches —
      // changed rounds never pay the set-difference shuffle and a
      // sketch collision cannot produce a false convergence.
      converged = newSketch == edgeSketch && small.exceptAll(edges).isEmpty
      edgeSketch = newSketch
      edges = small
      iter += 1
    }
    require(converged,
      s"star contraction did not converge in $iter rounds")
    // stars: every u points at its root v; roots label themselves
    (nodes.join(edges.select(col("u").as("node"), col("v").as("root")),
        Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("root"), col("node")).as("root")),
      iter)
  }
}
