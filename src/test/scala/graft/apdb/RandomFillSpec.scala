package graft.apdb

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class RandomFillSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val declared = StructType(Seq(
    StructField("id", LongType),
    StructField("fDouble", DoubleType), StructField("fFloat", FloatType),
    StructField("fLong", LongType), StructField("fInt", IntegerType),
    StructField("fShort", ShortType), StructField("fByte", ByteType),
    StructField("fBool", BooleanType), StructField("fStr", StringType),
    StructField("fBin", BinaryType), StructField("fTs", TimestampType),
    StructField("validityStart", TimestampType)))

  test("widen fills every declared non-system column with its type") {
    import spark.implicits._
    val df = spark.range(100).toDF("id")
    val wide = RandomFill.widen(df, declared, seed = 5)
    // system column untouched (absent), all others present and typed
    assert(!wide.columns.contains("validityStart"))
    val bySchema = wide.schema.fields.map(f => f.name -> f.dataType).toMap
    declared.fields.filterNot(f =>
      RandomFill.systemColumns.contains(f.name)).foreach { f =>
      assert(bySchema(f.name) == f.dataType, s"${f.name}")
    }
    val rows = wide.collect()
    assert(rows.length == 100)
    // values vary (random, not constant)
    assert(wide.select(countDistinct(col("fDouble"))).head().getLong(0) > 90)
    assert(wide.select(countDistinct(col("fStr"))).head().getLong(0) > 90)
    // strings have the requested length
    assert(rows.forall(_.getAs[String]("fStr").length == 16))
    // reproducible with the same seed
    val again = RandomFill.widen(df, declared, seed = 5).collect()
    assert(rows.map(_.getAs[Double]("fDouble")).toSeq ==
      again.map(_.getAs[Double]("fDouble")).toSeq)
  }

  test("present columns pass through unchanged") {
    import spark.implicits._
    val df = spark.range(10).toDF("id").withColumn("fInt", lit(7))
    val wide = RandomFill.widen(df, declared)
    assert(wide.select("fInt").collect().forall(_.getInt(0) == 7))
  }
}
