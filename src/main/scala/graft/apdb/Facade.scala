package graft.apdb

import org.apache.spark.sql.DataFrame

/** Client-facing facade conventions of the reference's `l1db.L1db`:
  * column renaming between the DB schema and the client
  * (afw.table-style) catalog convention, and configuration loaded from
  * an override file.
  */

/** Column rename map between L1DB schema names and the client catalog
  * convention (`/root/reference/README.md:55-61`):
  *  - `diaObjectId` ↔ `id` (DiaObject), `diaSourceId` ↔ `id` (DiaSource)
  *  - `ra` ↔ `coord_ra`, `dec` ↔ `coord_dec` (the reference schema spells
  *    it `decl`; this engine uses the modern DPDD `dec`)
  *  - `parentDiaSourceId` ↔ `parent` (DiaSource)
  * Other columns pass through unchanged; no unit conversion (degrees on
  * both sides, as the reference documents).
  */
object AfwRenames {

  private val common = Seq("ra" -> "coord_ra", "dec" -> "coord_dec")

  /** db-name -> client-name pairs for a table. */
  def renames(t: Schemas.Table): Seq[(String, String)] = t match {
    case Schemas.DiaObject | Schemas.DiaObjectLast =>
      ("diaObjectId" -> "id") +: common
    case Schemas.DiaSource =>
      Seq("diaSourceId" -> "id", "parentDiaSourceId" -> "parent") ++ common
    case Schemas.DiaForcedSource => common // diaObjectId stays (FK)
  }

  /** DB convention → client convention (applied to read results). */
  def toClient(t: Schemas.Table, df: DataFrame): DataFrame =
    renames(t).foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }

  /** Client convention → DB convention (applied to store inputs).
    * Columns already in DB convention pass through, so callers can mix. */
  def fromClient(t: Schemas.Table, df: DataFrame): DataFrame =
    renames(t).foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(to) && !d.columns.contains(from))
        d.withColumnRenamed(to, from)
      else d
    }
}

/** Config-from-file (`ap_proto -c overrides.py` analog,
  * `config.py:33-123`): simple `key = value` lines, `#` comments, with
  * the reference's pex.config parameter names accepted as aliases for
  * the engine's fields (a `config.` prefix is stripped, so a pex-style
  * override file mostly loads as-is). Unknown keys fail loudly — a
  * typo'd tuning knob silently ignored is worse than an error. */
object ApdbConfigIO {

  /** reference name → copy function. */
  private val setters: Map[String, (ApdbConfig, String) => ApdbConfig] = Map(
    "warehouseDir" -> ((c, v) => c.copy(warehouseDir = v)),
    "pixLevel" -> ((c, v) => c.copy(pixLevel = v.toInt)),
    "pixMode" -> ((c, v) => c.copy(pixMode = v)),
    "pixBucketShift" -> ((c, v) => c.copy(pixBucketShift = v.toInt)),
    "maxEnvelopeRanges" -> ((c, v) => c.copy(maxEnvelopeRanges = v.toInt)),
    "fovDeg" -> ((c, v) => c.copy(fovDeg = v.toDouble)),
    "FOV_deg" -> ((c, v) => c.copy(fovDeg = v.toDouble)),
    "regionPaddingArcsec" -> ((c, v) => c.copy(regionPaddingArcsec = v.toDouble)),
    "detector_region_padding" -> ((c, v) => c.copy(regionPaddingArcsec = v.toDouble)),
    "readSourcesMonths" -> ((c, v) => c.copy(readSourcesMonths = v.toDouble)),
    "read_sources_months" -> ((c, v) => c.copy(readSourcesMonths = v.toDouble)),
    "readForcedSourcesMonths" -> ((c, v) => c.copy(readForcedSourcesMonths = v.toDouble)),
    "read_forced_sources_months" -> ((c, v) => c.copy(readForcedSourcesMonths = v.toDouble)),
    "forcedCutoffDays" -> ((c, v) => c.copy(forcedCutoffDays = v.toInt)),
    "forced_cutoff_days" -> ((c, v) => c.copy(forcedCutoffDays = v.toInt)),
    "transientPerVisit" -> ((c, v) => c.copy(transientPerVisit = v.toDouble)),
    "transient_per_visit" -> ((c, v) => c.copy(transientPerVisit = v.toDouble)),
    "falsePerVisit" -> ((c, v) => c.copy(falsePerVisit = v.toDouble)),
    "false_per_visit" -> ((c, v) => c.copy(falsePerVisit = v.toDouble)),
    "detectionFraction" -> ((c, v) => c.copy(detectionFraction = v.toDouble)),
    "detection_fraction" -> ((c, v) => c.copy(detectionFraction = v.toDouble)),
    "srcReadDutyCycle" -> ((c, v) => c.copy(srcReadDutyCycle = v.toDouble)),
    "src_read_duty_cycle" -> ((c, v) => c.copy(srcReadDutyCycle = v.toDouble)),
    "srcReadPeriod" -> ((c, v) => c.copy(srcReadPeriod = v.toInt)),
    "src_read_period" -> ((c, v) => c.copy(srcReadPeriod = v.toInt)),
    "fillEmptyFields" -> ((c, v) => c.copy(fillEmptyFields = v.toBoolean)),
    "fill_empty_fields" -> ((c, v) => c.copy(fillEmptyFields = v.toBoolean)),
    "visitIntervalSec" -> ((c, v) => c.copy(visitIntervalSec = v.toLong)),
    "interval" -> ((c, v) => c.copy(visitIntervalSec = v.toLong)),
    "replicaChunkSeconds" -> ((c, v) => c.copy(replicaChunkSeconds = v.toLong)),
    "replicaChunkKeepDays" -> ((c, v) => c.copy(replicaChunkKeepDays = v.toDouble)),
    "replica_chunk_keep_days" -> ((c, v) => c.copy(replicaChunkKeepDays = v.toDouble)),
    "clientNaming" -> ((c, v) => c.copy(clientNaming = v.toBoolean)),
  )

  def knownKeys: Set[String] = setters.keySet

  /** Apply `key = value` override lines to a base config. */
  def fromLines(lines: Seq[String], base: ApdbConfig): ApdbConfig =
    lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .foldLeft(base) { (cfg, line) =>
        val Array(k0, v0) = line.split("=", 2).map(_.trim) match {
          case Array(k, v) => Array(k, v)
          case _ => throw new IllegalArgumentException(
            s"config line is not 'key = value': $line")
        }
        val k = k0.stripPrefix("config.")
        // strip optional quotes around string values
        val v = v0.stripPrefix("\"").stripSuffix("\"")
        setters.getOrElse(k, throw new IllegalArgumentException(
          s"unknown config key '$k' (known: ${knownKeys.toSeq.sorted.mkString(", ")})"))
          .apply(cfg, v)
      }

  /** Load an override file on top of a base config. */
  def fromFile(path: String, base: ApdbConfig): ApdbConfig = {
    import scala.jdk.CollectionConverters._
    fromLines(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).asScala.toSeq, base)
  }
}
