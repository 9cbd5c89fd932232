package graft.apdb

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.geom._

/** Persisted, pixel-bucketed variable-source catalog — the at-scale
  * replacement for holding the catalog in memory (the reference loads
  * its whole source array into RAM, `ap_proto.py:279-281`, and cone-
  * filters it per visit, `DIA.py:72-77`; that stops working past ~1 B
  * rows on one node, and the round-7 fallback — regenerating the
  * catalog per visit — made the 1000× probe pay a 37 s full-catalog
  * scan every visit).
  *
  * This is exactly the S2 machinery `obj_last` already uses, applied to
  * the catalog: write once partitioned by `pix_bucket = pixelId >>
  * shift` and sorted by `pixelId` within each bucket (tight row-group
  * stats), then each visit reads ONLY the buckets overlapping the FOV
  * envelope, with the pixelId range predicate pushed into parquet so
  * row-group pruning applies inside each bucket. Per-visit read cost is
  * proportional to FOV rows (a ~5e-4 sky fraction), not catalog rows —
  * the shape a 100 TB catalog on a cluster has, where the catalog is a
  * partitioned table and every executor reads only its FOV slice.
  */
object CatalogStore {

  def dir(warehouse: String): String = s"$warehouse/catalog"
  private def metaPath(warehouse: String) =
    s"$warehouse/catalog/_catalog_meta.json"

  /** Read schema: generator columns + the spatial index pair. Explicit,
    * so reads skip schema inference over hundreds of bucket dirs. */
  private val schema = StructType(Seq(
    StructField("sourceIdx", LongType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("z", DoubleType, nullable = false),
    StructField("pixelId", LongType, nullable = false),
    StructField("pix_bucket", LongType, nullable = false)))

  /** A persisted catalog exists iff its meta marker does (the marker is
    * written LAST, so a killed half-finished write never reads back as
    * a complete catalog — the write simply reruns). */
  def exists(warehouse: String): Boolean =
    graft.EstateFs.exists(metaPath(warehouse))

  /** The source tag recorded at write time (e.g. "gen:<n>:<seed>" or
    * "file:<path>") — resume paths compare it so a rerun with a
    * DIFFERENT catalog spec fails loudly instead of silently serving
    * the stale persisted catalog. */
  def sourceTag(warehouse: String): Option[String] =
    if (!exists(warehouse)) None
    else """"source":"([^"]*)"""".r
      .findFirstMatchIn(graft.EstateFs.readString(metaPath(warehouse)))
      .map(_.group(1))

  /** One-time build: index every row with the configured pixel scheme,
    * co-locate by bucket (one shuffle — the only time the full catalog
    * moves), sort by pixelId within buckets, write. Returns row count.
    *
    * `coLocate = false` skips the bucket shuffle: each input partition
    * sorts itself by (bucket, pixelId) and writes its own file per
    * bucket — Spark's default sort-based dynamic-partition write, one
    * open writer per task, bounded memory. Peak disk = output only
    * (the shuffle variant transiently doubles it with shuffle files),
    * at the cost of ~inputPartitions files per bucket instead of one.
    * That is the right trade exactly when the catalog is too big to
    * cache — the case ApSim uses it for — and per-file pixelId sorting
    * keeps row-group stats tight either way. */
  def write(spark: SparkSession, catalog: DataFrame, warehouse: String,
      cfg: ApdbConfig, coLocate: Boolean = true,
      sourceTag: String = ""): Long = {
    val indexed = catalog
      .withColumn("pixelId",
        SparkGeo.pixelIndexSky(cfg.skyPix, col("x"), col("y"), col("z")))
      .withColumn("pix_bucket", shiftright(col("pixelId"), cfg.pixBucketShift))
    val arranged =
      if (coLocate)
        indexed.repartition(col("pix_bucket"))
          .sortWithinPartitions(col("pixelId"))
      else
        indexed.sortWithinPartitions(col("pix_bucket"), col("pixelId"))
    arranged
      .write.mode(SaveMode.Overwrite)
      .partitionBy("pix_bucket")
      .parquet(dir(warehouse))
    val n = spark.read.schema(schema).parquet(dir(warehouse)).count()
    // Marker via the atomic write primitive (same protocol as
    // TextIndex.append): a crash mid-write must leave NO marker
    // (triggering rebuild), never a truncated one that passes exists()
    // but fails the scheme check.
    graft.EstateFs.writeStringAtomic(metaPath(warehouse),
      s"""{"rows":$n,"pixLevel":${cfg.pixLevel},"pixMode":"${cfg.pixMode}","pixBucketShift":${cfg.pixBucketShift},"source":"$sourceTag"}""")
    n
  }

  /** FOV-pruned read: bucket partition pruning + pushed pixelId range
    * refine — a superset of the exact cone, which the caller (the DIA
    * cone filter in [[DiaSim.makeSources]]) refines row-exactly.
    * Refuses a catalog written under a different pixel scheme: its
    * pixelIds would silently prune WRONG buckets. */
  def readFov(spark: SparkSession, warehouse: String, region: Region,
      cfg: ApdbConfig): DataFrame = {
    val meta = graft.EstateFs.readString(metaPath(warehouse))
    val want =
      s""""pixLevel":${cfg.pixLevel},"pixMode":"${cfg.pixMode}","pixBucketShift":${cfg.pixBucketShift}"""
    require(meta.contains(want),
      s"persisted catalog at ${dir(warehouse)} was built with a different " +
        s"pixel scheme ($meta; expected $want) — rebuild it or match the config")
    val ranges =
      SparkGeo.coarsen(cfg.skyPix.envelope(region), cfg.maxEnvelopeRanges)
    val buckets = ranges
      .flatMap { case (lo, hi) =>
        (lo >> cfg.pixBucketShift) to ((hi - 1) >> cfg.pixBucketShift)
      }
      .distinct
    spark.read.schema(schema).parquet(dir(warehouse))
      .where(col("pix_bucket").isin(buckets: _*)) // partition pruning
      .where(SparkGeo.rangePredicate(col("pixelId"), ranges)) // row-group prune + refine
      .select(col("sourceIdx"), col("x"), col("y"), col("z"))
  }
}
