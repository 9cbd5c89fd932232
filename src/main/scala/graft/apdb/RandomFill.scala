package graft.apdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema widening with typed random fill — capability match for
  * `_fillRandomData` (`/root/reference/python/lsst/l1dbproto/
  * _executors.py:432-503`, F11/C13): a client catalog carrying a subset
  * of the declared felis schema is widened to the full schema, missing
  * columns filled with type-appropriate random data. All nine datatype
  * branches are seeded column expressions (no UDFs): strings/bytes
  * derive from md5 of a seeded rand so they are reproducible.
  */
object RandomFill {

  /** Columns the DB layer owns and never random-fills
    * (`_executors.py:453-457`). */
  val systemColumns: Set[String] =
    Set("validityStart", "validityEnd", "pixelId", "pix_bucket")

  private def randomColumn(f: StructField, seed: Long): Column = f.dataType match {
    case DoubleType => rand(seed)
    case FloatType => rand(seed).cast(FloatType)
    case LongType => (rand(seed) * 1000000).cast(LongType)
    case IntegerType => (rand(seed) * 1000000).cast(IntegerType)
    case ShortType => (rand(seed) * 32767).cast(ShortType)
    case ByteType => (rand(seed) * 127).cast(ByteType)
    case BooleanType => rand(seed) < 0.5
    case StringType => substring(md5(rand(seed).cast("string")), 1, 16)
    case BinaryType => unhex(md5(rand(seed).cast("string")))
    case TimestampType =>
      timestamp_seconds((rand(seed) * 4102444800.0).cast(LongType))
    case other =>
      throw new IllegalArgumentException(s"no random fill for $other")
  }

  /** Widen `df` to `schema`, filling missing non-system columns with
    * seeded random data; present columns pass through unchanged. */
  def widen(df: DataFrame, schema: StructType, seed: Long = 1L): DataFrame = {
    val present = df.columns.toSet
    schema.fields.zipWithIndex.foldLeft(df) { case (acc, (f, i)) =>
      if (present.contains(f.name) || systemColumns.contains(f.name)) acc
      else acc.withColumn(f.name, randomColumn(f, seed + i))
    }
  }
}
