package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader/writer for the reference's variable-source catalog wire format:
  * NumPy `.npy` version 1.0 holding an (N, 3) little-endian float64
  * array of unit vectors (`gen_sources.py:86-87` writes it with
  * `numpy.save`; `ap_proto.py:279-281` loads it). The format is public
  * and documented (numpy.lib.format).
  *
  * Read path is distributed: the tiny header is parsed driver-side, then
  * each partition of `spark.range(n)` seeks into the fixed-width body
  * and reads its contiguous row block — no driver materialization, the
  * fixed-record-binary scan shape that works at any catalog size on a
  * shared filesystem.
  */
object NumpyCatalog {

  private val Magic: Array[Byte] =
    Array(0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  /** Parse the npy v1 header: returns (rows, dataOffset). Validates
    * dtype '<f8', C order, (N, 3) shape. */
  def readHeader(path: String): (Long, Long) = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val magic = new Array[Byte](6)
      raf.readFully(magic)
      require(magic.sameElements(Magic), s"$path is not an .npy file")
      val major = raf.read(); val minor = raf.read()
      require(major == 1 && minor == 0, s"unsupported npy version $major.$minor")
      val lenBytes = new Array[Byte](2)
      raf.readFully(lenBytes)
      val headerLen = ByteBuffer.wrap(lenBytes)
        .order(ByteOrder.LITTLE_ENDIAN).getShort & 0xffff
      val headerBytes = new Array[Byte](headerLen)
      raf.readFully(headerBytes)
      val header = new String(headerBytes, "ASCII")
      require(header.contains("'descr': '<f8'"),
        s"expected little-endian float64, got header: $header")
      require(header.contains("'fortran_order': False"),
        s"expected C order, got header: $header")
      val shape = "'shape':\\s*\\((\\d+),\\s*(\\d+)\\)".r
        .findFirstMatchIn(header)
        .getOrElse(throw new IllegalArgumentException(s"no shape in: $header"))
      require(shape.group(2) == "3", s"expected (N, 3), got ${shape.group(0)}")
      (shape.group(1).toLong, 10L + headerLen)
    } finally raf.close()
  }

  /** Distributed read → DataFrame(sourceIdx long, x, y, z double). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val (n, offset) = readHeader(path)
    spark.range(n).map(_.toLong).mapPartitions { it =>
      // ranges from spark.range are contiguous per partition: seek once
      val rows = it.toArray
      if (rows.isEmpty) Iterator.empty
      else {
        val raf = new RandomAccessFile(path, "r")
        try {
          val buf = new Array[Byte](rows.length * 24)
          raf.seek(offset + rows.head * 24)
          raf.readFully(buf)
          val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
          rows.iterator.map { i =>
            (i, bb.getDouble, bb.getDouble, bb.getDouble)
          }.toArray.iterator
        } finally raf.close()
      }
    }.toDF("sourceIdx", "x", "y", "z")
  }

  /** Write a catalog DataFrame(x, y, z [, ...]) as npy v1 (N, 3)
    * float64 — single-file driver-streamed (the format is a single
    * array; memory stays bounded via toLocalIterator). Rows are written
    * in sourceIdx order when the column exists. */
  def write(df: DataFrame, path: String): Long = {
    val ordered =
      if (df.columns.contains("sourceIdx")) df.orderBy("sourceIdx") else df
    val n = ordered.count()
    val header = {
      val dict = s"{'descr': '<f8', 'fortran_order': False, 'shape': ($n, 3), }"
      // pad with spaces so (magic 6 + ver 2 + len 2 + header) % 64 == 0
      val base = 10 + dict.length + 1 // + newline
      val pad = (64 - base % 64) % 64
      dict + (" " * pad) + "\n"
    }
    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    try {
      out.write(Magic)
      out.write(1); out.write(0)
      val lenBuf = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
      lenBuf.putShort(header.length.toShort)
      out.write(lenBuf.array())
      out.write(header.getBytes("ASCII"))
      val rowBuf = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
      val xi = ordered.schema.fieldIndex("x")
      val yi = ordered.schema.fieldIndex("y")
      val zi = ordered.schema.fieldIndex("z")
      val it = ordered.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        rowBuf.clear()
        rowBuf.putDouble(r.getDouble(xi))
        rowBuf.putDouble(r.getDouble(yi))
        rowBuf.putDouble(r.getDouble(zi))
        out.write(rowBuf.array())
      }
    } finally out.close()
    n
  }
}
