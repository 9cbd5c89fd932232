package graft.fs

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, FileUtil, Path, RawLocalFileSystem}

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
  *    exclusive-create).
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

  override def listStatus(p: Path): Array[FileStatus] = {
    val all = super.listStatus(p)
    val cut = FaultyFileSystem.listingAsOfMs
    if (cut <= 0L) all
    else all.filter(_.getModificationTime <= cut)
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

  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.faulty.impl", classOf[FaultyFileSystem].getName)

  def reset(): Unit = {
    renamePause = () => ()
    listingAsOfMs = 0L
  }
}
