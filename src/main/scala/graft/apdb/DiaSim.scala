package graft.apdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geom._

/** Difference-image-analysis simulator — capability match for
  * `/root/reference/python/lsst/l1dbproto/DIA.py:60-88`: per visit,
  * detect known variable sources inside the FOV (cone filter + Bernoulli
  * detection fraction) and add Poisson-distributed transients/noise
  * uniform in the FOV. All per-row math is column expressions; only the
  * Poisson draw is driver-side (a single scalar per visit).
  */
object DiaSim {

  /** Layout-independent uniform draw in [0, 1): the per-row hash
    * modulo 2^40 (exactly uniform — 2^40 divides the 2^64 hash space).
    * Spark's `rand(seed)` streams are seeded PER
    * PARTITION and advance in row order, so their values change
    * whenever the partition layout does — and layout is NOT stable
    * under the operational events a visit must survive: executor loss
    * changes `defaultParallelism` (which sizes `spark.range` and
    * file-split planning), so a RETRIED visit would redraw DIFFERENT
    * transients/detections than its first attempt (the round-14 chaos
    * probe caught exactly this: visit-3 transients diverged after a
    * mid-visit executor kill; VisitRetrySpec pins the fix). Keying the
    * draw to (row id, seed) makes it a pure function of the data. */
  private def u01(k: org.apache.spark.sql.Column, seed: Long)
      : org.apache.spark.sql.Column =
    pmod(xxhash64(k, lit(seed)), lit(1L << 40)).cast("double") /
      (1L << 40).toDouble

  /** Distributed catalog bootstrap (`gen_sources.py` analog): n points
    * uniform on the hemisphere (z <= 0 when hemi < 0), seeded — a
    * single spark.range stage, no shuffle. The gaussian draws ride
    * `randn(seed)` (per-partition streams), so the VALUES are pinned by
    * the slice count chosen at generation: callers persist/checkpoint
    * the catalog once and every later read sees a fixed layout —
    * retry-safe; only re-GENERATING under a different parallelism
    * yields a different (equally distributed) sky. */
  def genCatalog(spark: SparkSession, n: Long, hemi: Int = -1,
      seed: Long = 42L, slices: Int = 0): DataFrame = {
    // slices > 0 overrides default parallelism — the persisted-catalog
    // write sorts each input partition in memory, so billion-row
    // catalogs need more, smaller slices than cores
    val range = if (slices > 0) spark.range(0L, n, 1L, slices)
      else spark.range(n)
    val base = range.toDF("sourceIdx")
      .withColumn("gx", randn(seed))
      .withColumn("gy", randn(seed + 1))
      .withColumn("gz", randn(seed + 2))
      .withColumn("norm", sqrt(col("gx") * col("gx") +
        col("gy") * col("gy") + col("gz") * col("gz")))
      .where(col("norm") > 1e-12)
    val folded = hemi match {
      case h if h < 0 => base.withColumn("z", -abs(col("gz")) / col("norm"))
      case h if h > 0 => base.withColumn("z", abs(col("gz")) / col("norm"))
      case _ => base.withColumn("z", col("gz") / col("norm"))
    }
    folded
      .withColumn("x", col("gx") / col("norm"))
      .withColumn("y", col("gy") / col("norm"))
      .select(col("sourceIdx"), col("x"), col("y"), col("z"))
  }

  /** Detections for one visit: variables in FOV (cone filter F1 +
    * detection-fraction sample F2) ∪ transients uniform in FOV (U1).
    * Returned columns: diaObjectId (catalog idx for variables; NULL for
    * transients, assigned by the pipeline), x, y, z, is_transient. */
  def makeSources(spark: SparkSession, catalog: DataFrame, pointing: Vec3,
      config: ApdbConfig, visitId: Int): DataFrame = {
    val a = pointing.normalized
    val cosHalf = math.cos(config.fovRad / 2)

    // vectorized cone filter over the full catalog (DIA.py:72-77)
    var vars = catalog.where(
      col("x") * a.x + col("y") * a.y + col("z") * a.z >= cosHalf)
    if (config.detectionFraction < 1.0)
      // keyed to (sourceIdx, visit): the same source set is detected on
      // every retry and under any scan layout (see u01)
      vars = vars.where(
        u01(col("sourceIdx"), visitId.toLong * 7919L) < config.detectionFraction)
    val varsDetected = vars.select(
      col("sourceIdx").as("diaObjectId"), col("x"), col("y"), col("z"),
      lit(false).as("is_transient"))

    // Poisson transient count (DIA.py:82): one scalar drawn driver-side
    val rng = new scala.util.Random(visitId.toLong * 104729L + 17L)
    val nTransients = Generators.poisson(
      config.transientPerVisit + config.falsePerVisit, rng)

    // uniform-in-cone points as column math (generators.py:61-91):
    // z' uniform in [cos(fov/2), 1], azimuth uniform, rotated to pointing
    val rot = Mat3.rotateInto(Vec3.zAxis, a).m
    val seed = visitId.toLong * 15485863L + 3L
    val trans = spark.range(nTransients.toLong)
      .withColumn("u", u01(col("id"), seed))
      .withColumn("phi", u01(col("id"), seed + 1) * (2 * math.Pi))
      .withColumn("cz", lit(cosHalf) + col("u") * (1.0 - cosHalf))
      .withColumn("r", sqrt(lit(1.0) - col("cz") * col("cz")))
      .withColumn("cx", col("r") * cos(col("phi")))
      .withColumn("cy", col("r") * sin(col("phi")))
      .select(
        lit(null).cast("long").as("diaObjectId"),
        (col("cx") * rot(0) + col("cy") * rot(1) + col("cz") * rot(2)).as("x"),
        (col("cx") * rot(3) + col("cy") * rot(4) + col("cz") * rot(5)).as("y"),
        (col("cx") * rot(6) + col("cy") * rot(7) + col("cz") * rot(8)).as("z"),
        lit(true).as("is_transient"))

    varsDetected.unionByName(trans)
  }
}
