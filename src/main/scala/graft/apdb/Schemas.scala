package graft.apdb

import org.apache.spark.sql.types._

/** Declared table schemas — the felis-style schema registry the reference
  * exposes through `tableDef` (`_executors.py:445-463`). Spark type
  * mapping per SURVEY §1.3 (`_executors.py:466-498`).
  */
object Schemas {

  /** ApdbTables enum analog (`_executors.py:47,201-203`). */
  sealed trait Table { def name: String }
  case object DiaObject extends Table { val name = "DiaObject" }
  case object DiaObjectLast extends Table { val name = "DiaObjectLast" }
  case object DiaSource extends Table { val name = "DiaSource" }
  case object DiaForcedSource extends Table { val name = "DiaForcedSource" }

  /** pixelId column labeled with the pixelization level AND scheme it
    * was computed with, so PixelPruneRule injects range predicates in
    * the right id space (the engine's default mq3c level 8; ApdbSpark
    * relabels when configured differently). An htm/q3c pixelId pruned
    * with mq3c envelope ranges would silently drop qualifying rows —
    * the label is what makes the rule scheme-sound. */
  def pixelField(level: Int = 8, mode: String = "mq3c"): StructField =
    StructField("pixelId", LongType, nullable = false,
      new MetadataBuilder().putLong("graft.pixel.level", level.toLong)
        .putString("graft.pixel.mode", mode).build())

  /** Workload-filled DiaObject columns (`_executors.py:302-330`) +
    * system columns validityStart/validityEnd (`_executors.py:453-457`)
    * and pixelId (`_executors.py:458`). Angles in degrees
    * (README.md:63-66). */
  val diaObject: StructType = StructType(Seq(
    StructField("diaObjectId", LongType, nullable = false),
    StructField("ra", DoubleType, nullable = false),
    StructField("dec", DoubleType, nullable = false),
    StructField("nDiaSources", IntegerType, nullable = false),
    StructField("lastNonForcedSource", TimestampType, nullable = false),
    StructField("validityStart", TimestampType, nullable = false),
    pixelField()))

  /** DiaSource (`_executors.py:409-430`); diaSourceId is the
    * deterministic `(visit*n_det + det)*1e6 + rownum` sequence. */
  val diaSource: StructType = StructType(Seq(
    StructField("diaSourceId", LongType, nullable = false),
    StructField("diaObjectId", LongType, nullable = false),
    StructField("ra", DoubleType, nullable = false),
    StructField("dec", DoubleType, nullable = false),
    StructField("visit", IntegerType, nullable = false),
    StructField("detector", IntegerType, nullable = false),
    StructField("parentDiaSourceId", LongType, nullable = false),
    StructField("psFlux", DoubleType, nullable = false),
    StructField("psFluxErr", DoubleType, nullable = false),
    StructField("midpointMjdTai", DoubleType, nullable = false),
    pixelField()))

  /** DiaForcedSource (`_executors.py:360-371`). */
  val diaForcedSource: StructType = StructType(Seq(
    StructField("diaObjectId", LongType, nullable = false),
    StructField("ra", DoubleType, nullable = false),
    StructField("dec", DoubleType, nullable = false),
    StructField("visit", IntegerType, nullable = false),
    StructField("detector", IntegerType, nullable = false),
    StructField("midpointMjdTai", DoubleType, nullable = false),
    pixelField()))

  def tableDef(t: Table): StructType = t match {
    case DiaObject | DiaObjectLast => diaObject
    case DiaSource => diaSource
    case DiaForcedSource => diaForcedSource
  }

  /** First transient DiaObject id. The reference pins 1 000 000 000
    * (`ap_proto.py:84`), which encodes the CONTRACT "above every
    * variable-source id" for its 4.3 M-source catalog — but the
    * literal value breaks at ≥ 1 B-row catalogs: the r9 1000× soak
    * (4.3 B sourceIdx values) caught visit-2 history reads returning
    * rows for FRESH transient ids because variable ids ≥ 1e9 collided
    * with the transient range (and an obj_last upsert under a collided
    * id would silently merge two different objects). 4e12 keeps the
    * contract at any catalog this engine targets while leaving ids
    * well inside Long. */
  val TransientStartId: Long = 4000000000000L
  /** Sentinel for detections outside the tile region
    * (`_executors.py:57-58`). */
  val OutsiderId: Long = -666L
}
