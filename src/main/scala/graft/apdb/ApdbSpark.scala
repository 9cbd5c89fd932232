package graft.apdb

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.geom._

/** Engine configuration (defaults mirror the reference's
  * `config.py:33-123`). */
final case class ApdbConfig(
    warehouseDir: String,
    pixLevel: Int = 8,
    /** spatial-index scheme: mq3c (row-major quad cube, default), q3c
      * (Morton quad cube) or htm — the reference's part_sim study
      * choices, selectable per deployment. */
    pixMode: String = "mq3c",
    /** partition bucket = pixelId >> shift; at level 8 and shift 10 this
      * yields 384 buckets — wide enough for 1000-executor parallelism,
      * coarse enough that a FOV touches only a handful. */
    pixBucketShift: Int = 10,
    /** cap on envelope range-predicate length (query fan-out control,
      * the reference's num_queries metric `metrics.md:43-45`). */
    maxEnvelopeRanges: Int = 64,
    fovDeg: Double = 3.52,
    regionPaddingArcsec: Double = 52.0,
    /** Visit cadence in seconds (`config.py:49` `interval`) — both the
      * simulated time step between visits and the real-time budget each
      * visit is graded against. */
    visitIntervalSec: Long = 45L,
    /** History-read windows (README.md:136-155). Double, in months:
      * the reference's configs are integer months, but compressed-time
      * soaks need sub-month windows to demonstrate bounded reads
      * within one simulated night (cutoff math is day-based anyway). */
    readSourcesMonths: Double = 12.0,
    readForcedSourcesMonths: Double = 6.0,
    /** Fraction of visits that read (forced) source history, over a
      * repeating period (`config.py:79-86`): visit reads history iff
      * `visit % srcReadPeriod < round(srcReadPeriod * srcReadDutyCycle)`
      * — F9's duty-cycle semantics wired into the pipeline. */
    srcReadDutyCycle: Double = 1.0,
    srcReadPeriod: Int = 1000,
    /** Widen store() inputs to the declared schema with typed random
      * fill for missing columns (`config.py:87-90`, F11/C13). */
    fillEmptyFields: Boolean = false,
    forcedCutoffDays: Int = 30,
    transientPerVisit: Double = 100.0,
    falsePerVisit: Double = 5050.0,
    detectionFraction: Double = 1.0,
    replicaChunkSeconds: Long = 600L,
    replicaChunkKeepDays: Int = -1,
    /** When true the facade speaks the client (afw.table-style) column
      * convention (README.md:55-61 renames): reads return `id` /
      * `coord_ra` / `coord_dec` / `parent`, store() accepts them. */
    clientNaming: Boolean = false) {
  val pix: Pixelization = Pixelization(pixLevel)
  /** The configured scheme's pixelator (envelope + index source). */
  val skyPix: SkyPixelization = SkyPixelization(pixMode, pixLevel)
  val fovRad: Double = math.toRadians(fovDeg)
}

/** Spark-native APDB: the reference's database API surface
  * (README.md:98-180 — getDiaObjects / getDiaSources /
  * getDiaForcedSources / store / tableDef) over partitioned Parquet.
  *
  * Physical design (SURVEY §4):
  *  - `obj_last` — denormalized latest-version snapshot, partitioned by
  *    pixel bucket; region reads prune partitions via bucket predicates
  *    then refine with pixelId ranges (two-phase spatial filtering,
  *    README.md:26-28).
  *  - `objects` — append-only version history (SCD-2); `validityEnd`
  *    is derived at read time with a lead() window (W3) instead of
  *    rewriting rows on every upsert — at 100 TB an in-place truncate
  *    would rewrite the whole partition per visit.
  *  - `sources` / `fsources` — append-only facts partitioned by 30-day
  *    MJD bucket; history reads prune by bucket + pushdown cutoff.
  *  - `*_chunks` — CDC mirror partitioned by replica chunk id; retention
  *    is a partition drop (T8).
  */
final class ApdbSpark(val spark: SparkSession, val config: ApdbConfig) {
  import config._

  private val W = warehouseDir

  private def path(t: String) = s"$W/$t"

  private def exists(t: String): Boolean =
    graft.EstateFs.listNames(path(t)).exists(n =>
      n.endsWith(".parquet") || n.startsWith("pix_bucket=") ||
        n.startsWith("mjd_bucket=") || n.startsWith("apdb_replica_chunk="))

  private def readOrEmpty(t: String, schema: StructType): DataFrame =
    if (exists(t)) spark.read.schema(schema).parquet(path(t))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  // -- telemetry ----------------------------------------------------------

  /** Per-visit metrics sink (reference vocabulary, `metrics.md`): when
    * attached, reads emit `select_query_stats` (num_queries /
    * num_sp_part fan-out counters) and store() emits per-table
    * insert_time + tile_store_time — the records log2csv/log2influx
    * consume. The pipeline attaches it per visit. */
  private var metricsSink: Option[(MetricsLog, Int, Timestamp)] = None
  def attachMetrics(log: MetricsLog, visit: Int, visitTime: Timestamp): Unit =
    metricsSink = Some((log, visit, visitTime))
  def detachMetrics(): Unit = metricsSink = None

  private def emitRecord(name: String, table: String,
      kv: Seq[(String, Double)]): Unit =
    metricsSink.foreach { case (log, v, ts) => log.record(ts, name, v, table, kv) }

  private def timed[T](name: String, table: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val out = f
    metricsSink.foreach { case (log, v, ts) =>
      log.timer(ts, name, v, table, (System.nanoTime() - t0) / 1e9)
    }
    out
  }

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("pix_bucket", shiftright(col("pixelId"), pixBucketShift))

  import org.apache.spark.sql.types.LongType
  /** Relabel pixelId with the *configured* level and scheme so
    * PixelPruneRule computes envelopes in the matching id space. */
  private def relabel(s: StructType): StructType =
    StructType(s.map(f =>
      if (f.name == "pixelId") Schemas.pixelField(pixLevel, pixMode) else f))
  private val objSchema = relabel(Schemas.diaObject).add("pix_bucket", LongType)
  private val srcSchema =
    relabel(Schemas.diaSource).add("pix_bucket", LongType).add("mjd_bucket", LongType)
  private val fsrcSchema =
    relabel(Schemas.diaForcedSource).add("pix_bucket", LongType).add("mjd_bucket", LongType)

  /** `makeSchema(drop)` analog (README.md:100-104). */
  def makeSchema(drop: Boolean = false): Unit = {
    if (drop) graft.EstateFs.deleteRecursive(W)
    graft.EstateFs.mkdirs(W)
  }

  // -- reads --------------------------------------------------------------

  /** Latest-version objects whose pixel overlaps `region`'s envelope —
    * a deliberate superset; callers refine with the exact row filter
    * (two-phase pattern, `_executors.py:182-189`). `columns` restricts
    * the projection (the `dia_object_columns` config, README.md:125-127
    * / F10) so parquet only reads those columns. */
  def getDiaObjects(region: Region, columns: Seq[String] = Nil): DataFrame = {
    val ranges = SparkGeo.coarsen(skyPix.envelope(region), maxEnvelopeRanges)
    val buckets = bucketsOf(ranges)
    // query fan-out counters (`metrics.md:43-45`): one range predicate ≈
    // one query; one bucket ≈ one spatial partition touched
    emitRecord("select_query_stats", "DiaObject",
      Seq("num_queries" -> ranges.length.toDouble,
        "num_sp_part" -> buckets.length.toDouble))
    val base = readOrEmpty("obj_last", objSchema)
      .where(col("pix_bucket").isin(buckets: _*)) // partition pruning
      .where(SparkGeo.rangePredicate(col("pixelId"), ranges)) // row refine
      .drop("pix_bucket")
    val named =
      if (clientNaming) AfwRenames.toClient(Schemas.DiaObjectLast, base)
      else base
    if (columns.isEmpty) named
    else named.select(columns.map(col): _*)
  }

  /** The ONE range→bucket derivation (half-open `[lo,hi)` ranges, so
    * the last contributing pixel is `hi - 1`) — getDiaObjects and
    * fovBuckets must never drift apart on this. */
  private def bucketsOf(ranges: Seq[(Long, Long)]): Seq[Long] =
    ranges.flatMap { case (lo, hi) =>
      (lo >> pixBucketShift) to ((hi - 1) >> pixBucketShift)
    }.distinct

  /** Padded-FOV pixel buckets (the shared coarse-prune set of
    * getDiaObjects / CatalogStore.readFov / the history reads). */
  private def fovBuckets(region: Region): Seq[Long] =
    bucketsOf(SparkGeo.coarsen(skyPix.envelope(region), maxEnvelopeRanges))

  /** DiaSource history for an ID set with a months cutoff
    * (README.md:130-140). `ids` joins semi (scales past isin lists).
    *
    * `region`: optional coarse prune on top of the exact ID semi-join.
    * The reference contract is ids-only (README.md:130), but when the
    * ids came from a region read (the visit pipeline), every matching
    * source lies inside the region padded TWICE by the association
    * radius — a matched object can sit up to one radius outside the
    * FOV, and its sources scatter up to another radius around the
    * object — so callers must pass the DOUBLY-padded region
    * (`fov.padded(r).padded(r)`, as VisitPipeline does); with that,
    * bucket pruning the scan is strictly result-identical while
    * cutting it from table-sized to FOV-sized:
    * the term that turns a whole-sky history table into a per-visit
    * read at survey scale (the r9 50-visit soak measured this read
    * linear in rows scanned). Callers whose ids are NOT region-derived
    * leave it None and keep the exact contract. */
  def getDiaSources(ids: DataFrame, visitTime: Timestamp,
      region: Option[Region] = None): DataFrame = {
    val cutoff = mjd(visitTime) - readSourcesMonths * 30.0
    val scanned = readOrEmpty("sources", srcSchema)
      .where(col("mjd_bucket") >= math.floor(cutoff / 30.0).toLong)
    val spatial = region.fold(scanned)(r =>
      scanned.where(col("pix_bucket").isin(fovBuckets(r): _*)))
    val base = spatial
      .where(col("midpointMjdTai") >= cutoff)
      .join(ids.select(col(ids.columns.head).as("diaObjectId")), Seq("diaObjectId"), "left_semi")
      .drop("pix_bucket", "mjd_bucket")
    if (clientNaming) AfwRenames.toClient(Schemas.DiaSource, base) else base
  }

  /** DiaForcedSource history (README.md:143-155, shorter window).
    * `region` as in [[getDiaSources]]. */
  def getDiaForcedSources(ids: DataFrame, visitTime: Timestamp,
      region: Option[Region] = None): DataFrame = {
    val cutoff = mjd(visitTime) - readForcedSourcesMonths * 30.0
    val scanned = readOrEmpty("fsources", fsrcSchema)
      .where(col("mjd_bucket") >= math.floor(cutoff / 30.0).toLong)
    val spatial = region.fold(scanned)(r =>
      scanned.where(col("pix_bucket").isin(fovBuckets(r): _*)))
    val base = spatial
      .where(col("midpointMjdTai") >= cutoff)
      .join(ids.select(col(ids.columns.head).as("diaObjectId")), Seq("diaObjectId"), "left_semi")
      .drop("pix_bucket", "mjd_bucket")
    if (clientNaming) AfwRenames.toClient(Schemas.DiaForcedSource, base) else base
  }

  /** Full version history (validityEnd derived via W3 lead window). */
  def getDiaObjectsHistory: DataFrame = {
    val w = Window.partitionBy(col("diaObjectId")).orderBy(col("validityStart"))
    readOrEmpty("objects", objSchema)
      .withColumn("validityEnd", lead(col("validityStart"), 1).over(w))
      .drop("pix_bucket")
  }

  def objectsLast: DataFrame = readOrEmpty("obj_last", objSchema).drop("pix_bucket")
  def sources: DataFrame = readOrEmpty("sources", srcSchema).drop("pix_bucket", "mjd_bucket")
  def forcedSources: DataFrame = readOrEmpty("fsources", fsrcSchema).drop("pix_bucket", "mjd_bucket")

  // -- mid-visit retry exactness (round 14) -------------------------------
  //
  // The reference's database backends make a retried visit naturally
  // idempotent: every row lands by PRIMARY-KEY UPSERT (Cassandra/SQL),
  // so `ap_proto`'s redo-a-failed-visit operational model re-overwrites
  // the same rows for free. A parquet-append store loses that property:
  // SaveMode.Append knows no keys, so a visit crashing between its
  // append jobs leaves partial rows and a blind redo duplicates them
  // (duplicate version rows break the lead()-window validity
  // derivation; duplicate facts double history). Restored with three
  // estate-style mechanisms (the TextIndex delta-batch playbook):
  //
  //  1. FILE PROVENANCE ([[stagedAppend]]) — each append job lands in a
  //     hidden staging dir (the committer makes the job all-or-nothing
  //     there), then its data files MOVE into the final partition dirs
  //     under a `v<visitMillis>-` name prefix: metadata renames on
  //     HDFS/local (on rename-as-copy object stores this costs one
  //     extra copy of the visit's own new files — the price of
  //     retry-exactness there). Readers never interpret file names.
  //  2. SCRUB ([[scrubVisitAppends]]) — deletes exactly one visit's
  //     appended files, nothing else; the retry fence calls it before
  //     a full redo.
  //  3. MERGE INTENT — the one non-append write, the DiaObjectLast
  //     touched-bucket rewrite, runs LAST behind an atomic intent
  //     marker. Dynamic partition overwrite commits per job but is not
  //     atomic ACROSS partitions, so a crash mid-commit can leave half
  //     the touched buckets merged; [[redoObjLastMerge]] reconstructs
  //     the visit's version rows from the (by then complete and
  //     exactly-once) history append and re-runs the per-bucket
  //     overwrite — idempotent whether or not the crashed attempt's
  //     overwrite reached a bucket, because
  //     (desired ∖ ids(new)) ∪ new = desired.
  //
  // The fence itself lives in [[VisitPipeline.visit]] (it owns the
  // visit-state checkpoint and the retry decision); store() only
  // provides the primitives and the ordering. Retry exactness also
  // leans on visit recompute DETERMINISM (seeded synthesis, rank-based
  // ids) — pinned by the cross-executor parity runs. A store() caller
  // outside the visit pipeline leaves its intent file behind; that is
  // harmless (intents only steer a retry of the SAME visitTime) and
  // the next pipeline visit clears stale ones.

  /** Test seam: runs after each store() phase ("objects", "sources",
    * "fsources", "mirrors", "intent", "merge") so a spec can kill the
    * store at every protocol-relevant instant deterministically (the
    * compactCrashHook pattern). No-op in production. */
  private[apdb] var storeCrashHook: String => Unit = _ => ()

  private[apdb] def visitTag(visitTime: Timestamp): String =
    s"v${visitTime.getTime}-"

  private[apdb] val appendTables =
    Seq("objects", "sources", "fsources",
      "obj_chunks", "src_chunks", "fsrc_chunks")

  private def hfs(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Recursive file walk via listStatus — NOT FileSystem.listFiles,
    * whose LocatedFileStatus path loads permissions through
    * `new java.io.File(uri)` and dies on non-file schemes (the
    * faulty:// test store; same class of issue on some connectors). */
  private def walkFiles(f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path)
      (visit: org.apache.hadoop.fs.FileStatus => Unit): Unit =
    f.listStatus(p).foreach { st =>
      if (st.isDirectory) walkFiles(f, st.getPath)(visit) else visit(st)
    }

  /** Append with per-visit file provenance; see the block comment. */
  private def stagedAppend(df: DataFrame, t: String, partCols: Seq[String],
      tag: String): Unit = {
    val staging = s"$W/.stage_$t"
    graft.EstateFs.deleteRecursive(staging) // debris of a crashed attempt
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partCols: _*).parquet(staging)
    val sp = new org.apache.hadoop.fs.Path(staging)
    val f = hfs(sp)
    val spStr = f.makeQualified(sp).toString
    walkFiles(f, sp) { st =>
      val name = st.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        val rel = f.makeQualified(st.getPath).toString
          .stripPrefix(spStr).stripPrefix("/")
        val relDir = rel.stripSuffix(name).stripSuffix("/")
        val target = new org.apache.hadoop.fs.Path(
          if (relDir.isEmpty) path(t) else s"${path(t)}/$relDir")
        f.mkdirs(target)
        val dest = new org.apache.hadoop.fs.Path(target, tag + name)
        require(f.rename(st.getPath, dest),
          s"staged-append move failed: ${st.getPath} -> $dest")
      }
    }
    f.delete(sp, true): Unit
  }

  /** Delete every append-table file carrying `visitTime`'s provenance
    * tag (a crashed attempt's partial appends). Returns files removed;
    * 0 on a first attempt — the fence costs six directory listings. */
  def scrubVisitAppends(visitTime: Timestamp): Int = {
    val tag = visitTag(visitTime)
    val n = appendTables.map { t =>
      val root = new org.apache.hadoop.fs.Path(path(t))
      val f = hfs(root)
      if (!f.exists(root)) 0
      else {
        var k = 0
        walkFiles(f, root) { st =>
          if (st.getPath.getName.startsWith(tag) &&
            f.delete(st.getPath, false)) k += 1
        }
        k
      }
    }.sum
    if (n > 0) emitRecord("delete_counts", "retry_scrub",
      Seq("files_scrubbed" -> n.toDouble))
    n
  }

  private def intentPath(ms: Long) = s"$W/obj_last_intent_$ms.json"

  /** The committed-but-possibly-unfinished merge intent for this visit:
    * Some(touched buckets) when the crashed attempt finished EVERY
    * append and reached the merge (the intent is written after the
    * appends, atomically); None otherwise. */
  private[apdb] def mergeIntent(visitTime: Timestamp): Option[Seq[Long]] = {
    val p = intentPath(visitTime.getTime)
    if (!graft.EstateFs.exists(p)) None
    else Some("""-?\d+""".r
      .findAllIn(graft.EstateFs.readString(p).dropWhile(_ != '['))
      .map(_.toLong).toSeq)
  }

  /** Delete this visit's intent — the caller does this only AFTER the
    * visit-state checkpoint lands (the intent must outlive the merge so
    * a crash between them stays recoverable). */
  private[apdb] def clearMergeIntent(visitTime: Timestamp): Unit = {
    graft.EstateFs.deleteIfExists(intentPath(visitTime.getTime)): Unit
  }

  /** Drop intents AND attempt markers of visits OLDER than `visitTime`:
    * a crash between the state write and the marker deletes leaves
    * them behind, permanently inert (their visit is checkpointed
    * complete). */
  private[apdb] def clearStaleIntents(visitTime: Timestamp): Unit =
    graft.EstateFs.listNames(W).foreach { n =>
      // guarded parse: a stray marker-shaped file with a non-numeric
      // middle (operator debris, backup suffixes) must be ignored, not
      // crash every subsequent visit on this first-thing-in-the-fence
      // walk
      val ms =
        if (n.startsWith("obj_last_intent_") && n.endsWith(".json"))
          n.stripPrefix("obj_last_intent_").stripSuffix(".json").toLongOption
        else if (n.startsWith("visit_attempt_") && n.endsWith(".json"))
          n.stripPrefix("visit_attempt_").stripSuffix(".json").toLongOption
        else None
      if (ms.exists(_ < visitTime.getTime))
        graft.EstateFs.deleteIfExists(s"$W/$n"): Unit
    }

  private def attemptMarkerPath(ms: Long) = s"$W/visit_attempt_$ms.json"

  /** True iff a previous ATTEMPT at this visit started (and therefore
    * may have crashed mid-store) — the cheap gate that keeps the
    * 6-tree scrub walk OFF the steady-state visit path: a first
    * attempt pays one existence probe + one atomic marker write. */
  private[apdb] def priorAttempt(visitTime: Timestamp): Boolean =
    graft.EstateFs.exists(attemptMarkerPath(visitTime.getTime))

  private[apdb] def markAttempt(visitTime: Timestamp): Unit =
    graft.EstateFs.writeStringAtomic(attemptMarkerPath(visitTime.getTime),
      s"""{"visit_ms":${visitTime.getTime}}""")

  private[apdb] def clearAttempt(visitTime: Timestamp): Unit = {
    graft.EstateFs.deleteIfExists(attemptMarkerPath(visitTime.getTime)): Unit
  }

  /** This visit's appended version rows — the redo/recovery source
    * (exactly-once by provenance once the intent exists). */
  private[apdb] def versionsAt(visitTime: Timestamp): DataFrame =
    readOrEmpty("objects", objSchema)
      .where(col("validityStart") === lit(visitTime))

  private[apdb] def sourcesAtVisit(visitId: Int): DataFrame =
    readOrEmpty("sources", srcSchema).where(col("visit") === visitId)

  private[apdb] def forcedAtVisit(visitId: Int): DataFrame =
    readOrEmpty("fsources", fsrcSchema).where(col("visit") === visitId)

  /** Re-run a committed-intent merge by REBUILDING every touched bucket
    * from the version history. The incremental `(existing ∖ new) ∪ new`
    * merge is idempotent only while `existing` survived — but a crash
    * INSIDE the dynamic-overwrite commit (partition deleted, staged
    * files not yet renamed in) can leave a touched bucket empty, and
    * merging this visit's versions into an emptied bucket would silently
    * drop every pre-existing object in it. The history append is
    * complete and exactly-once by the time the intent exists, so the
    * redo reconstructs the normal-path invariant directly: bucket B
    * holds, for every object with ≥1 version in B, its LATEST version
    * among B's versions (a later version in another bucket never
    * rewrites B — the per-bucket upsert [[mergeObjLast]] maintains,
    * same as the reference's per-partition primary key).
    * The scan partition-prunes to the touched buckets;
    * every touched bucket has ≥1 version (this visit's), so the dynamic
    * overwrite rewrites exactly the touched set — correct whether the
    * crashed attempt left a bucket merged, untouched, or emptied. */
  private[apdb] def redoObjLastMerge(visitTime: Timestamp,
      touched: Seq[Long]): Unit = {
    if (touched.isEmpty) return
    val w = Window.partitionBy(col("pix_bucket"), col("diaObjectId"))
      .orderBy(col("validityStart").desc)
    val desired = readOrEmpty("objects", objSchema)
      .where(col("pix_bucket").isin(touched: _*))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
    desired.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pix_bucket").parquet(path("obj_last"))
  }

  /** The DiaObjectLast touched-bucket rewrite: replace every new
    * version's row IN ITS BUCKET, keep the rest, dynamic overwrite only
    * the touched buckets. The anti-join is keyed (id, bucket) — the
    * reference's Cassandra upsert semantics exactly (DiaObjectLast's
    * primary key is (spatial partition, diaObjectId), so an object
    * whose position moves partitions upserts into the new one and its
    * old partition's row persists there; `cassandra.py` never deletes).
    * Keying on id alone would be STRONGER than the reference and, more
    * important, history-order-dependent: [[redoObjLastMerge]] rebuilds
    * a bucket as "latest version among the bucket's own versions",
    * which equals this per-bucket upsert by construction but could not
    * reproduce a cross-bucket eviction without replaying every visit's
    * touched set. */
  private def mergeObjLast(newVersions: DataFrame, touched: Seq[Long]): Unit = {
    if (touched.isEmpty) return
    val existing = readOrEmpty("obj_last", objSchema)
      .where(col("pix_bucket").isin(touched: _*))
    val merged = existing
      .join(newVersions.select(col("diaObjectId"), col("pix_bucket"))
          .distinct(),
        Seq("diaObjectId", "pix_bucket"), "left_anti")
      .unionByName(newVersions)
      // break lineage: the plan both reads and overwrites obj_last
      .localCheckpoint(true)
    try merged.write.mode(SaveMode.Overwrite)
      // per-write dynamic mode: only touched buckets are replaced,
      // without mutating session-wide overwrite semantics
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pix_bucket").parquet(path("obj_last"))
    // the write was the only consumer — release the blocks rather
    // than stranding a touched-bucket-sized set per visit, and release
    // on the FAILURE path too (a crashed merge must not leak them)
    finally scala.util.Try(org.apache.spark.sql.GraftColumnBridge
      .releaseLocalCheckpoint(merged)): Unit
  }

  // -- store --------------------------------------------------------------

  /** `store(visit_time, objects, sources, forced)` (README.md:157-180,
    * `_executors.py:221-238`): append version rows and facts and mirror
    * CDC chunks (all with per-visit file provenance), then merge the
    * latest snapshot LAST behind its intent marker (rewriting only
    * touched pixel buckets via dynamic partition overwrite), apply
    * retention. The append-then-merge order is load-bearing for the
    * retry fence — see the retry-exactness block above. */
  def store(visitTime: Timestamp, objectsIn: DataFrame, srcsIn: DataFrame,
      fsrcsIn: DataFrame): Unit = timed("tile_store_time", "all") {
    val chunkId = visitTime.getTime / 1000 / replicaChunkSeconds
    // accept client-convention catalogs (id/coord_ra/coord_dec/parent)
    // when the facade is configured for them — mixed inputs pass through;
    // with fillEmptyFields, widen partial catalogs to the declared
    // schema with typed random fill (`_fillRandomData` semantics, F11)
    def prep(t: Schemas.Table, df: DataFrame): DataFrame = {
      val named = if (clientNaming) AfwRenames.fromClient(t, df) else df
      // the DB layer owns the spatial index (`_executors.py:458`):
      // compute it from ra/dec when the client catalog omits it
      val withPix =
        if (named.columns.contains("pixelId")) named
        else named.withColumn("pixelId",
          SparkGeo.pixelIndexSkyRaDec(skyPix, col("ra"), col("dec")))
      if (fillEmptyFields) RandomFill.widen(withPix, Schemas.tableDef(t))
      else withPix
    }
    val objects = prep(Schemas.DiaObject, objectsIn)
    val srcs = prep(Schemas.DiaSource, srcsIn)
    val fsrcs = prep(Schemas.DiaForcedSource, fsrcsIn)

    val newVersions = withBucket(objects
      .withColumn("validityStart", lit(visitTime)))
      .select(objSchema.fieldNames.map(col): _*)
    val tag = visitTag(visitTime)

    // 1. version history append (validity truncation is derived at read)
    val cached = newVersions.cache()
    try {
    timed("insert_time", "DiaObject") {
      stagedAppend(cached, "objects", Seq("pix_bucket"), tag)
    }
    storeCrashHook("objects")
    val touched = cached.select(col("pix_bucket")).distinct()
      .collect().map(_.getLong(0))

    // 2. fact appends, partitioned by 30-day MJD bucket. Emptiness is
    //    probed ONCE per input — each isEmpty launches a job over the
    //    (caller-side, possibly uncheckpointed) prep plan, and the
    //    append gate, crash-hook gate, and mirror gate all need it.
    val srcsEmpty = srcs.isEmpty
    val fsrcsEmpty = fsrcs.isEmpty
    def withTimeBucket(df: DataFrame): DataFrame =
      withBucket(df).withColumn("mjd_bucket",
        floor(col("midpointMjdTai") / 30.0).cast("long"))
    if (!srcsEmpty) timed("insert_time", "DiaSource") {
      stagedAppend(
        withTimeBucket(srcs).select(srcSchema.fieldNames.map(col): _*),
        "sources", Seq("mjd_bucket"), tag)
    }
    if (!srcsEmpty) storeCrashHook("sources")
    if (!fsrcsEmpty) timed("insert_time", "DiaForcedSource") {
      stagedAppend(
        withTimeBucket(fsrcs).select(fsrcSchema.fieldNames.map(col): _*),
        "fsources", Seq("mjd_bucket"), tag)
    }
    storeCrashHook("fsources")

    // 3. CDC chunk mirror (README replica tables, `log2csv.py:105-107`)
    def mirror(df: DataFrame, empty: Boolean, t: String, table: String): Unit =
      if (!empty) timed("insert_time", table) {
        stagedAppend(df.withColumn("apdb_replica_chunk", lit(chunkId)),
          t, Seq("apdb_replica_chunk"), tag)
      }
    // the objects mirror reuses the CACHED canonical version rows (same
    // diaObject fields, pix_bucket dropped) instead of re-executing the
    // caller's prep plan — row-identical, one plan execution cheaper
    mirror(cached.drop("pix_bucket"), cached.isEmpty, "obj_chunks",
      "DiaObjectChunks")
    mirror(srcs, srcsEmpty, "src_chunks", "DiaSourceChunks")
    mirror(fsrcs, fsrcsEmpty, "fsrc_chunks", "DiaForcedSourceChunks")
    storeCrashHook("mirrors")

    // 4. snapshot merge LAST, behind its intent marker (the retry
    //    fence's commit point — see the retry-exactness block): every
    //    append above is complete and exactly-once before the intent
    //    lands, so a retry that finds the intent finishes the commit
    //    instead of re-running the visit
    graft.EstateFs.writeStringAtomic(intentPath(visitTime.getTime),
      s"""{"visit_ms":${visitTime.getTime},"buckets":[${touched.mkString(",")}]}""")
    storeCrashHook("intent")
    if (touched.nonEmpty) timed("insert_time", "DiaObjectLast") {
      mergeObjLast(cached, touched.toSeq)
    }
    storeCrashHook("merge")

    // 5. retention: drop expired chunk partitions (T8). Timed as the
    //    reference's per-table delete_time (`metrics.md:70-83`) so the
    //    nightly cleanup's cost is visible in the per-visit record.
    if (replicaChunkKeepDays > 0) {
      val minKeep = chunkId - replicaChunkKeepDays * 86400L / replicaChunkSeconds
      chunkTables.foreach { case (t, table) =>
        timed("delete_time", table) {
          val dropped = dropChunksBefore(t, minKeep)
          emitRecord("delete_counts", table,
            Seq("chunks_dropped" -> dropped.toDouble))
        }
      }
    }
    // finally: a store that THROWS mid-sequence (executor loss, fault
    // injection) must not leave the cache entry stranded for the retry
    } finally { cached.unpersist(): Unit }
    refreshViews()
  }

  private val chunkTables = Seq(
    "obj_chunks" -> "DiaObjectChunks",
    "src_chunks" -> "DiaSourceChunks",
    "fsrc_chunks" -> "DiaForcedSourceChunks")

  private def dropChunksBefore(t: String, minKeep: Long): Long = {
    var dropped = 0L
    graft.EstateFs.listNames(path(t)).foreach { n =>
      if (n.startsWith("apdb_replica_chunk=")) {
        val id = n.stripPrefix("apdb_replica_chunk=").toLong
        if (id < minKeep) {
          graft.EstateFs.deleteRecursive(s"${path(t)}/$n"); dropped += 1
        }
      }
    }
    dropped
  }

  /** Standalone chunk retention (T8) as of a given wall-clock time —
    * the same partition drop store() runs per visit, invocable from
    * the nightly maintenance job so retention fires even on nights the
    * ingest path is idle. Returns chunks dropped per CDC table. */
  def dropExpiredChunks(asOf: Timestamp): Map[String, Long] = {
    if (replicaChunkKeepDays <= 0) return chunkTables.map(_._2 -> 0L).toMap
    val minKeep = asOf.getTime / 1000 / replicaChunkSeconds -
      replicaChunkKeepDays * 86400L / replicaChunkSeconds
    chunkTables.map { case (t, table) =>
      table -> dropChunksBefore(t, minKeep)
    }.toMap
  }

  /** MJD (TAI≈UTC for the simulated era, SURVEY §7.4) from a timestamp. */
  def mjd(t: Timestamp): Double = t.getTime / 1000.0 / 86400.0 + 40587.0

  /** Nightly consolidation (`DiaObjectNightly` copy/delete semantics,
    * `log2influx.py:197-204` + T8): per-visit appends fragment the
    * tables into many small files — one per shuffle partition per
    * visit — which degrades scan planning at scale. Rewrite each
    * partitioned table into one file per partition (their natural
    * FOV-sized volume), preserving contents. Run at end of night like
    * the reference's daily consolidation. */
  /** Compaction rewrites tagged per-visit files into untagged compacted
    * ones — erasing the provenance the retry fence's SCRUB keys on. Run
    * while a visit's ATTEMPT marker is live (a pipeline visit in
    * flight, or crashed awaiting retry), that would let a later retry
    * duplicate every appended row: scrub finds zero tagged files, the
    * redo re-appends. Refuse loudly instead; the marker clears when the
    * visit completes (and stale ones on the next visit), so the refusal
    * is transient and the operator's move is "retry the visit first".
    * A LONE intent (no marker) does NOT refuse: it is direct-store()-
    * caller debris, and the intent recovery path never scrubs — it
    * rebuilds from rows, which compaction preserves. */
  private def requireNoRetryMarkers(op: String): Unit = {
    val live = graft.EstateFs.listNames(W)
      .filter(_.startsWith("visit_attempt_"))
    require(live.isEmpty,
      s"$op refused: visit attempt markers present (${live.mkString(", ")})" +
        " — a visit is in flight or crashed awaiting retry, and" +
        " compacting now would erase the file provenance its retry" +
        " scrub depends on. Retry or complete the visit first.")
  }

  def consolidateNight(): Unit = {
    requireNoRetryMarkers("consolidateNight")
    // DYNAMIC overwrite, never static: static Overwrite deletes the
    // whole table dir BEFORE the write job runs, so a compaction job
    // that fails mid-write (executor loss killing the lineage-break
    // blocks, fault injection) would destroy the table. Dynamic mode
    // stages all output first and replaces partitions only at commit —
    // a failed job leaves the table untouched, and the remaining
    // exposure (a crash inside commitJob emptying some partitions) is
    // the narrow window the visit path fences with its merge intent.
    // Checkpoints.stable makes the lineage break itself survive
    // executor loss when the session configures a checkpoint dir.
    def compact(t: String, schema: StructType, partCol: String): Unit = {
      if (!exists(t)) return
      val df = graft.operators.Checkpoints.stable(
        spark.read.schema(schema).parquet(path(t))
          .repartition(col(partCol)))
      try df.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol).parquet(path(t))
      finally graft.operators.Checkpoints.release(df)
    }
    compact("obj_last", objSchema, "pix_bucket")
    compact("objects", objSchema, "pix_bucket")
    compact("sources", srcSchema, "mjd_bucket")
    compact("fsources", fsrcSchema, "mjd_bucket")
    refreshViews()
  }

  /** Amortized consolidation (VERDICT r5 #5): rewrite ONLY the
    * partition directories holding more than `maxFilesPerPartition`
    * parquet fragments. Per-visit appends add a few files per table per
    * visit; left to accumulate, late-night history reads pay growing
    * list/open costs (the 100× soak's late-visit read inflation).
    * Bounded work per invocation — untouched partitions cost a
    * directory listing — so it can run BETWEEN visits; on a cluster it
    * is the background compaction job next to the visit critical path.
    * consolidateNight() remains the full end-of-night pass. At true
    * cluster scale the fact tables carry a spatial partition alongside
    * `mjd_bucket`, keeping each compaction unit FOV-sized.
    * Returns partitions compacted per table. */
  def compactFragmented(maxFilesPerPartition: Int = 48): Map[String, Int] = {
    requireNoRetryMarkers("compactFragmented")
    def one(t: String): Int = {
      if (!exists(t)) return 0
      val parts = graft.EstateFs.listDirNames(path(t))
        .filter(_.contains("="))
        .map(n => s"${path(t)}/$n")
      val frag = parts.filter(p =>
        graft.EstateFs.listNames(p).count(_.endsWith(".parquet")) >
          maxFilesPerPartition)
      frag.count { p =>
        // Rewrite THROUGH the table root with dynamic partition
        // overwrite (partition col reconstructed from the dir name)
        // rather than static-overwriting the partition dir: static
        // Overwrite deletes the dir before the job runs, so a job that
        // fails mid-write would destroy the partition (same hazard as
        // consolidateNight's — see there). Dynamic mode replaces only
        // this partition, and only at commit.
        val dirName = p.substring(p.lastIndexOf('/') + 1)
        val eq = dirName.indexOf('=')
        val pc = dirName.substring(0, eq)
        // all engine partition cols are non-null longs; a dir whose
        // value doesn't parse (__HIVE_DEFAULT_PARTITION__) is left
        // fragmented rather than crashed on — it cannot be addressed
        // through a reconstructed partition column
        scala.util.Try(dirName.substring(eq + 1).toLong).toOption.exists {
          pv =>
            val df = graft.operators.Checkpoints.stable(
              spark.read.parquet(p).repartition(1)
                .withColumn(pc, lit(pv)))
            try df.write.mode(SaveMode.Overwrite)
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy(pc).parquet(path(t))
            finally graft.operators.Checkpoints.release(df)
            true
        }
      }
    }
    val done = Seq("obj_last", "objects", "sources", "fsources")
      .map(t => t -> one(t)).toMap
    if (done.values.sum > 0) refreshViews()
    done
  }

  /** Register the engine tables as SQL temp views (`dia_object_last`,
    * `dia_object`, `dia_source`, `dia_forced_source`) so plain-SQL users
    * query them directly — with GraftExtensions active, a
    * `region_contains` filter over `dia_object_last` gains automatic
    * pixelId range pruning from PixelPruneRule.
    *
    * A registered view's parquet file listing is snapshotted at
    * registration, so store()/consolidateNight() automatically
    * re-register the views after rewriting files — queries never see
    * FileNotFoundException or stale rows from a superseded snapshot. */
  def registerViews(): Unit = {
    viewsRegistered = true
    objectsLast.createOrReplaceTempView("dia_object_last")
    getDiaObjectsHistory.createOrReplaceTempView("dia_object")
    sources.createOrReplaceTempView("dia_source")
    forcedSources.createOrReplaceTempView("dia_forced_source")
  }
  private var viewsRegistered = false
  /** Re-resolve the SQL views against the current files (no-op unless
    * registerViews was called). */
  private[apdb] def refreshViews(): Unit = if (viewsRegistered) registerViews()

  /** Parquet file count per table (compaction observability). */
  def fileCounts: Map[String, Int] =
    Seq("obj_last", "objects", "sources", "fsources").map { t =>
      def walk(p: String): Int = {
        val names = graft.EstateFs.listNames(p)
        graft.EstateFs.listDirNames(p).map(n => walk(s"$p/$n")).sum +
          names.count(_.endsWith(".parquet"))
      }
      t -> (if (graft.EstateFs.exists(path(t))) walk(path(t)) else 0)
    }.toMap
}
