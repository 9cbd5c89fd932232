package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The lease CLAIM primitive under real concurrency (round 12): the
  * two-JVM contention probe caught two processes both "winning"
  * Hadoop's local create(overwrite=false) — a client-side
  * check-then-create — and interleaving their consolidations into a
  * corrupted store. The claim now goes through
  * [[EstateFs.createExclusive]] (O_EXCL on the local scheme); this
  * spec hammers it from many threads, where the old primitive loses
  * reliably and the new one must admit EXACTLY one winner. */
class WriterLeaseSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("64 simultaneous acquires admit exactly ONE writer") {
    (1 to 5).foreach { round =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"leasehammer$round").toString
      val n = 64
      val start = new java.util.concurrent.CountDownLatch(1)
      val tokens = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val refusals = new java.util.concurrent.atomic.AtomicInteger(0)
      val surprises = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (0 until n).map { _ =>
        val t = new Thread(() => {
          start.await()
          try tokens.add(WriterLease.acquire(spark, dir, "hammer.")): Unit
          catch {
            case e: IllegalStateException
              if e.getMessage.contains("lease") => refusals.incrementAndGet()
            case _: Throwable => surprises.incrementAndGet()
          }
        })
        t.start(); t
      }
      start.countDown()
      threads.foreach(_.join(30000))
      assert(surprises.get() == 0, "non-lease failures in the hammer")
      assert(tokens.size == 1,
        s"round $round: ${tokens.size} writers claimed the lease at once")
      assert(refusals.get() == n - 1)
      // the file carries the winner's token; its release frees the dir
      val tok = tokens.iterator().next()
      assert(java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, "claims", "LEASE")) == tok)
      WriterLease.release(spark, dir, tok)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "claims", "LEASE")))
    }
  }

  test("acquire-release round trip and second-writer refusal") {
    val dir = java.nio.file.Files.createTempDirectory("leasert").toString
    val tok = WriterLease.acquire(spark, dir, "rt.")
    val e = intercept[IllegalStateException] {
      WriterLease.acquire(spark, dir, "rt.")
    }
    assert(e.getMessage.contains("another writer"))
    // release under the WRONG token must not evict the holder
    WriterLease.release(spark, dir, "not-the-token")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "claims", "LEASE")))
    WriterLease.release(spark, dir, tok)
    // freed: a new writer claims immediately
    val tok2 = WriterLease.acquire(spark, dir, "rt.")
    WriterLease.release(spark, dir, tok2)
  }
}
