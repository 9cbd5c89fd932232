package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.apdb.DiaSim

/** The reference's .npy catalog wire format: byte-exact v1 layout,
  * lossless round trip, distributed read. */
class NumpyCatalogSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("write emits the numpy v1 layout (magic, header, 64-byte align)") {
    val dir = Files.createTempDirectory("npy").toString
    val path = s"$dir/cat.npy"
    val catalog = DiaSim.genCatalog(spark, 100, hemi = -1, seed = 7)
    assert(NumpyCatalog.write(catalog, path) == 100)
    val bytes = Files.readAllBytes(Paths.get(path))
    // magic + version
    assert(bytes(0) == 0x93.toByte &&
      new String(bytes.slice(1, 6), "ASCII") == "NUMPY")
    assert(bytes(6) == 1 && bytes(7) == 0)
    // header is ASCII dict, newline-terminated, data 64-byte aligned
    val headerLen = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    assert((10 + headerLen) % 64 == 0)
    val header = new String(bytes.slice(10, 10 + headerLen), "ASCII")
    assert(header.contains("'descr': '<f8'"))
    assert(header.contains("'shape': (100, 3)"))
    assert(header.endsWith("\n"))
    // body: exactly N*3 little-endian doubles
    assert(bytes.length == 10 + headerLen + 100 * 24)
  }

  test("round trip is lossless and the read is distributed") {
    val dir = Files.createTempDirectory("npy_rt").toString
    val path = s"$dir/cat.npy"
    val catalog = DiaSim.genCatalog(spark, 5000, hemi = -1, seed = 11)
      .localCheckpoint(true)
    NumpyCatalog.write(catalog, path)
    val back = NumpyCatalog.read(spark, path)
    assert(back.rdd.getNumPartitions > 1) // per-partition seeks, no driver read
    val orig = catalog.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    val got = back.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    assert(got.length == orig.length)
    // bit-exact doubles through the wire format
    got.zip(orig).foreach { case (g, o) => assert(g == o) }
  }

  test("header validation rejects non-npy and wrong shapes") {
    val dir = Files.createTempDirectory("npy_bad").toString
    val bad = Paths.get(dir, "bad.npy")
    Files.write(bad, "not an npy file at all".getBytes)
    intercept[IllegalArgumentException] {
      NumpyCatalog.readHeader(bad.toString)
    }
  }
}
