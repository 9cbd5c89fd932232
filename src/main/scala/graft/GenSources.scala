package graft

import org.apache.spark.sql.SparkSession

import graft.apdb.DiaSim
import graft.sources.NumpyCatalog

/** `gen_sources` analog (`/root/reference/bin.src/gen_sources.py`):
  * generate the variable-source catalog — per-visit count scaled to the
  * whole sky (or hemisphere) by area — and save it in the reference's
  * `.npy` wire format (or parquet when the output ends in `.parquet`).
  *
  * Usage: runMain graft.GenSources <outFile> [countsPerVisit] [hemi] [seed]
  */
object GenSources {
  val FovDeg = 3.5 // gen_sources.py:47

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GenSources <outFile> [counts] [hemi] [seed]")
    val outFile = args(0)
    val countsPerVisit = if (args.length > 1) args(1).toInt else 10000
    val hemi = if (args.length > 2) args(2).toInt else 0
    val seed = if (args.length > 3) args(3).toLong else 42L
    // total = per-visit count scaled by sky/FOV area (gen_sources.py:80-84)
    val area = if (hemi != 0) 2 * math.Pi else 4 * math.Pi
    val visitArea = math.Pi * math.pow(math.toRadians(FovDeg) / 2, 2)
    val total = (countsPerVisit * area / visitArea).toLong

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val catalog = DiaSim.genCatalog(spark, total, hemi = hemi, seed = seed)
    if (outFile.endsWith(".parquet"))
      catalog.write.mode("overwrite").parquet(outFile)
    else
      NumpyCatalog.write(catalog, outFile)
    println(s"""{"sources":$total,"out":"$outFile"}""")
    spark.stop()
  }
}
