package graft.fs

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, FileStatus, FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test-only Hadoop `FileSystem` under the `faulty://` scheme that
  * mimics an object store's weaknesses over a local directory
  * (VERDICT r11 #6): the estate protocols' `file://` specs prove API
  * routing, not semantics under a store that lacks POSIX guarantees —
  * this shim removes exactly the guarantees a bare object store lacks,
  * so the lifecycle specs can prove the posture CONTRACT instead of
  * asserting it in scaladoc.
  *
  *  - **`rename` is NON-ATOMIC**: a copy-then-delete (S3A's shape),
  *    with an injectable [[FaultyFileSystem.renamePause]] between the
  *    copy and the delete — the window where two stale-lease breakers
  *    interleave ([[graft.WriterLease]]'s break arbitration assumes an
  *    atomic rename; the object-store posture disables the break arm
  *    because of precisely this).
  *  - **listing can LAG creates** ([[FaultyFileSystem.listingAsOfMs]]):
  *    `listStatus` serves an as-of snapshot — entries created after
  *    the instant are invisible. Marker-driven enumeration must
  *    degrade to a stale-but-consistent snapshot under it.
  *  - `create(overwrite=false)` keeps RawLocalFileSystem's
  *    check-then-create (already S3-realistic: no server-side
  *    exclusive-create) — UNLESS [[FaultyFileSystem.conditionalCreate]]
  *    is on, which models a store WITH conditional writes (If-None-
  *    Match, VERDICT r12 #2): bytes buffer locally, the object lands
  *    all-or-nothing at `close()` via an atomic CREATE_NEW, and a lost
  *    race surfaces as an `IOException` AT CLOSE — exactly the shape
  *    Hadoop 3.4.2's S3A conditional-create support exposes. In that
  *    mode the scheme also advertises
  *    [[graft.EstateFs.ConditionalCreateCapability]], and rename stays
  *    the non-atomic copy+delete — the combination the conditional
  *    lease break targets. [[FaultyFileSystem.conditionalClosePause]]
  *    runs between close() being called and the atomic landing, to
  *    open the claim race deterministically.
  *
  * Install with [[FaultyFileSystem.install]]; reset hooks in a
  * `finally` via [[FaultyFileSystem.reset]].
  */
class FaultyFileSystem extends RawLocalFileSystem {

  override def getScheme: String = "faulty"

  override def getUri: URI = URI.create("faulty:///")

  /** Copy-then-delete with the pause hook in the gap — deliberately
    * NOT atomic. Keeps Hadoop's rename-into-existing-dir semantics so
    * Spark's output committer still works on the scheme. */
  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    val realDst =
      if (exists(dst) && getFileStatus(dst).isDirectory)
        new Path(dst, src.getName)
      else dst
    if (exists(realDst)) return false
    FileUtil.copy(this, src, this, realDst, false, getConf)
    FaultyFileSystem.renamePause()
    delete(src, true)
    true
  }

  // RawLocalFileSystem intercepts BOTH create funnels (the
  // permission-less overload short-circuits FileSystem.create(Path,
  // boolean) before the FsPermission one) — override both or the
  // conditional mode silently misses half the callers
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (!FaultyFileSystem.conditionalCreate || overwrite)
      super.create(f, overwrite, bufferSize, replication, blockSize, progress)
    else conditionalCreateStream(f)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (!FaultyFileSystem.conditionalCreate || overwrite)
      super.create(f, permission, overwrite, bufferSize, replication,
        blockSize, progress)
    else conditionalCreateStream(f)

  private def conditionalCreateStream(f: Path): FSDataOutputStream = {
      val local = pathToFile(f).toPath
      val buf = new java.io.ByteArrayOutputStream()
      val out = new java.io.OutputStream {
        private var closed = false
        override def write(b: Int): Unit = buf.write(b)
        override def write(b: Array[Byte], off: Int, len: Int): Unit =
          buf.write(b, off, len)
        override def close(): Unit = {
          if (closed) return
          closed = true
          java.nio.file.Files.createDirectories(local.getParent)
          FaultyFileSystem.conditionalClosePause()
          try java.nio.file.Files.write(local, buf.toByteArray,
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE): Unit
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              throw new java.io.IOException(
                s"conditional create failed (If-None-Match): $f already exists")
          }
        }
      }
      new FSDataOutputStream(out, null)
    }

  override def hasPathCapability(path: Path, capability: String): Boolean =
    if (FaultyFileSystem.conditionalCreate &&
        capability == graft.EstateFs.ConditionalCreateCapability) true
    else super.hasPathCapability(path, capability)

  override def listStatus(p: Path): Array[FileStatus] = {
    val all = super.listStatus(p)
    val cut = FaultyFileSystem.listingAsOfMs
    if (cut <= 0L) all
    else all.filter(_.getModificationTime <= cut)
  }

  /** Hook point for the scenario-G TOCTOU spec: [[FaultyFileSystem
    * .openPause]] runs at open() entry, BEFORE the file is actually
    * opened — park a reader here and replace the file underneath it to
    * open the read-read race deterministically. */
  override def open(p: Path, bufferSize: Int):
      org.apache.hadoop.fs.FSDataInputStream = {
    FaultyFileSystem.openPause(p)
    super.open(p, bufferSize)
  }
}

object FaultyFileSystem {

  /** Runs between rename's copy and its delete — park a thread here to
    * open the non-atomic window deterministically. */
  @volatile var renamePause: () => Unit = () => ()

  /** When > 0, `listStatus` serves the listing AS OF this epoch-ms
    * instant: anything created/modified after it is invisible — a
    * freshly-committed marker lags until the "store" catches up. */
  @volatile var listingAsOfMs: Long = 0L

  /** Conditional-create mode: `create(overwrite=false)` becomes an
    * atomic If-None-Match-shaped claim landing at close(), and the
    * scheme advertises the conditional-create path capability. */
  @volatile var conditionalCreate: Boolean = false

  /** Runs inside conditional close(), before the atomic landing —
    * park a claimer here to race two claims deterministically. */
  @volatile var conditionalClosePause: () => Unit = () => ()

  /** Runs at open() entry with the path — park a lease-token reader
    * here and swap the file to reproduce the scenario-G TOCTOU
    * deterministically. */
  @volatile var openPause: Path => Unit = _ => ()

  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.faulty.impl", classOf[FaultyFileSystem].getName)

  def reset(): Unit = {
    renamePause = () => ()
    listingAsOfMs = 0L
    conditionalCreate = false
    conditionalClosePause = () => ()
    openPause = _ => ()
  }
}
