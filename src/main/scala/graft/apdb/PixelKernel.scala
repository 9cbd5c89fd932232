package graft.apdb

import graft.geom._

/** Static kernel entry points referenced from generated code (whole-stage
  * codegen emits plain static calls — same pattern Spark uses for its own
  * hash/math functions). Region objects are cached by their serialized
  * form so per-row calls never re-parse.
  */
object PixelKernel {

  private val pixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Pixelization]()
  private val skyCache =
    new java.util.concurrent.ConcurrentHashMap[String, SkyPixelization]()
  private val regionCache =
    new java.util.concurrent.ConcurrentHashMap[String, Region]()

  def pixAt(level: Int): Pixelization =
    pixCache.computeIfAbsent(level, l => Pixelization(l))

  /** Scheme-parametrized pixelator (htm / q3c / mq3c), cached per
    * (mode, level) — executor-side entry point for codegen calls. */
  def skyAt(mode: String, level: Int): SkyPixelization =
    skyCache.computeIfAbsent(s"$mode:$level",
      _ => SkyPixelization(mode, level))

  def indexRaDec(ra: Double, dec: Double, level: Int): Long =
    pixAt(level).index(ra, dec)

  def indexXyz(x: Double, y: Double, z: Double, mode: String,
      level: Int): Long =
    skyAt(mode, level).index(Vec3(x, y, z))

  def parseRegion(s: String): Region =
    regionCache.computeIfAbsent(s, RegionCodec.decode)

  def contains(region: Region, ra: Double, dec: Double): Boolean =
    region.contains(ra, dec)
}

/** Compact textual region codec for passing regions through SQL string
  * literals: `C:x,y,z,halfAngleRad` for circles,
  * `P:x1,y1,z1;x2,y2,z2;...` for convex polygons. */
object RegionCodec {
  def encode(r: Region): String = r match {
    case Circle(a, half) =>
      val n = a.normalized
      s"C:${n.x},${n.y},${n.z},$half"
    case SphericalPolygon(vs) =>
      "P:" + vs.map(v => s"${v.x},${v.y},${v.z}").mkString(";")
  }

  def decode(s: String): Region = s.splitAt(2) match {
    case ("C:", body) =>
      val Array(x, y, z, half) = body.split(",").map(_.toDouble)
      Circle(Vec3(x, y, z), half)
    case ("P:", body) =>
      SphericalPolygon(body.split(";").toIndexedSeq.map { v =>
        val Array(x, y, z) = v.split(",").map(_.toDouble)
        Vec3(x, y, z)
      })
    case _ =>
      throw new IllegalArgumentException(s"bad region literal: $s")
  }

  /** Base64 wrapping for transport through attachment-hostile channels
    * (the reference base64-encodes regions for subprocess scatter,
    * `_executors.py:553` / `ap_proto_visit.py:125` — C12; Spark's
    * shuffle replaces the scatter, the wire format remains supported). */
  def encodeB64(r: Region): String =
    java.util.Base64.getEncoder.encodeToString(
      encode(r).getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def decodeB64(s: String): Region =
    decode(new String(java.util.Base64.getDecoder.decode(s),
      java.nio.charset.StandardCharsets.UTF_8))
}
