package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Single-writer lease over a directory-rooted store.
  *
  * Extracted from [[CurationWarehouse]] (where it serializes ingests,
  * round 7) so every estate mutator shares ONE protocol (round 10's
  * lease parity): the index-maintenance verbs ([[TextIndex.compact]],
  * [[TextIndex.mergeDeltas]], [[VectorIndex.rebalanceIvf]]) are
  * crash-safe against kill-and-rerun but NOT against two LIVE
  * invocations — both stage into the same next-version/segment paths
  * or overwrite the same codes table, so a cron double-fire of the
  * nightly job would interleave two writers' staging. The lease turns
  * that corruption into a fast, retriable refusal. Appends stay
  * lease-free on the index estates: concurrent-append-during-
  * consolidation safety is by snapshot protocol (spec-pinned), and
  * stream ingests are serialized by the stream itself.
  *
  * Protocol (unchanged from the warehouse original): the lease is
  * `claims/LEASE` under the store dir, created fail-if-exists — the
  * atomic claim. It carries its owner's unique TOKEN: release deletes
  * only a lease still holding the releaser's token, and a crashed
  * writer's stale lease (older than [[TtlMs]]) is broken by an atomic
  * RENAME followed by a token re-check of the renamed file — an
  * overtaken writer cannot delete its successor's lease, and a breaker
  * that raced a fresh re-acquire renames the fresh lease straight
  * back instead of stealing it.
  *
  * SCOPE of the mutual-exclusion guarantee (ADVICE r11): both atomic
  * primitives the protocol leans on — exclusive create
  * ([[EstateFs.createExclusive]]: O_EXCL locally, server-side on
  * HDFS) and rename — hold on HDFS and local POSIX, and that is where
  * the guarantee holds. On a bare object store (S3A), `create(overwrite=
  * false)` is a client-side check-then-PUT and `rename` is a
  * copy+delete, so neither claim nor break arbitration is atomic;
  * there the lease is best-effort only, and a deployment needs
  * Hadoop's conditional-create (If-None-Match) support or an external
  * lock service for true exclusion. Under the object-store posture
  * (`graft.fs.atomicRename=false`) the stale-BREAK arm is disabled in
  * code (refusal with operator guidance) because break arbitration is
  * the piece that fails first without atomic rename.
  */
object WriterLease {

  /** A lease older than this is considered abandoned by a crashed
    * writer and may be broken. Generous against long consolidations —
    * a healthy writer finishes far sooner. A wrongly-broken LIVE
    * writer is NOT automatically safe against the new holder: the
    * index consolidation verbs stage with `SaveMode.Overwrite` into
    * fixed paths and commit markers with overwrite semantics, so two
    * live writers WOULD interleave. That is why every consolidation
    * verb re-verifies lease ownership via [[verifyHeld]] immediately
    * before its commit point — a BEST-EFFORT NARROWING of the overtake
    * window (check-then-act, see [[verifyHeld]]), not a closure of it;
    * the staged debris of an aborted writer is overwritten by the
    * successor or the rerun.
    * (CurationWarehouse's ingest protocol alone is fail-if-exists all
    * the way down and survives a wrong break without the re-check.) */
  val TtlMs: Long = 30L * 60L * 1000L

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def leasePath(dir: String) = new Path(s"$dir/claims/LEASE")

  /** Write our unique token into a freshly-created lease file. The
    * create-exclusive is the atomic claim ([[EstateFs.createExclusive]]
    * — O_EXCL on local, server-enforced create on HDFS; Hadoop's local
    * create(overwrite=false) is check-then-act and the r12 two-JVM
    * contention probe caught two processes both winning it); the token
    * is the OWNERSHIP PROOF that release/break verify against, so no
    * writer can ever delete or break a lease it does not hold. */
  private def tryCreateLease(p: Path, token: String): Boolean =
    EstateFs.createExclusive(p.toString, token)

  private def leaseToken(f: org.apache.hadoop.fs.FileSystem,
      p: Path): Option[String] =
    scala.util.Try {
      val in = f.open(p)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }.toOption

  /** Acquire the store's single-writer lease; returns the owner token
    * to pass to [[release]]. Must be held across the writer's whole
    * read-decide-commit span.
    *
    * Stale-break protocol (a crashed writer's lease must not brick the
    * store): observe the holder's TOKEN, wait out the TTL evidence
    * (mtime), atomically RENAME the lease aside, then VERIFY the
    * renamed file still carries the observed stale token. The rename
    * is what makes two breakers safe (only one wins); the post-rename
    * token check is what makes breaker-vs-fresh-holder safe — if the
    * stale holder released and a NEW writer re-acquired between our
    * staleness check and our rename, the renamed file carries the new
    * token, we rename it straight back and fail instead of stealing a
    * live writer's lease.
    *
    * @param why appended to the refusal message: what the exclusion
    *            protects (ends with a period). */
  def acquire(spark: SparkSession, dir: String, why: String): String = {
    val f = fs(spark, dir)
    f.mkdirs(new Path(dir, "claims"))
    val lease = leasePath(dir)
    val token = java.util.UUID.randomUUID().toString
    if (tryCreateLease(lease, token)) return token
    // TOKEN FIRST, staleness second — the order is load-bearing
    // (contention scenario G's first cross-JVM catch, round 13): with
    // status-then-token, a racing breaker can break the planted stale
    // lease and re-claim INSIDE the gap, and this observer then pairs
    // the OLD file's stale mtime with the NEW holder's token — "stale
    // lease, token <live holder>" — and breaks a live writer (two real
    // JVMs both returned from acquire; the audit record carried the
    // first winner's fresh token). Reading the token first makes the
    // staleness evidence POSTDATE the token read: a lease replaced in
    // the gap shows its fresh mtime at the status read and simply
    // refuses, and no writer ever creates a lease with an old mtime,
    // so "stale at the status read" pins the token to the dead
    // generation it was read from.
    val observedTok = leaseToken(f, lease)
    val st = scala.util.Try(f.getFileStatus(lease)).toOption
    val staleTok = if (st.exists(s =>
      System.currentTimeMillis() - s.getModificationTime > TtlMs))
      observedTok else None
    // Object-store posture (graft.fs.atomicRename=false): the rename-
    // based break protocol's safety rests on the aside-RENAME being
    // atomic (only one of two racing breakers wins). On a store where
    // rename is a non-atomic copy+delete, two breakers can BOTH observe
    // the stale token, both copy it aside, and both claim — exactly the
    // two-live-consolidations interleave the lease exists to prevent
    // (VERDICT r11 #1). Under that posture:
    //  - a store with CONDITIONAL CREATE (If-None-Match — VERDICT r12
    //    #2) breaks via [[breakWithConditionalCreate]]: arbitration by
    //    exclusive ticket instead of by rename;
    //  - otherwise never auto-break: refuse with the file an operator
    //    must remove by hand.
    if (staleTok.isDefined && !EstateFs.atomicRenamePosture) {
      if (EstateFs.conditionalCreateCapable(lease.toString))
        return breakWithConditionalCreate(f, dir, staleTok.get, token, why)
      throw new IllegalStateException(
        s"$dir: stale single-writer lease (claims/LEASE, older than " +
          s"${TtlMs / 60000} min, token ${staleTok.get.take(8)}…) on a " +
          s"non-atomic-rename store (${EstateFs.AtomicRenameKey}=false)" +
          " — the automatic break is disabled because it needs an " +
          "atomic rename (or conditional create, " +
          s"${EstateFs.ConditionalCreateKey}=true) to arbitrate racing " +
          "breakers. Verify the old writer is dead, then delete " +
          s"$dir/claims/LEASE by hand and retry. $why")
    }
    staleTok match {
      case Some(observed) =>
        val aside = new Path(
          s"$dir/claims/LEASE.broken.${java.util.UUID.randomUUID()}")
        if (f.rename(lease, aside)) {
          if (leaseToken(f, aside).contains(observed)) {
            // provably the stale holder's lease; claim for ourselves
            if (tryCreateLease(lease, token)) return token
          } else {
            // we renamed a FRESH holder's lease (stale one released and
            // someone new acquired in between) — put it back untouched.
            // The restore MUST succeed: if a third writer claimed the
            // now-empty lease path in this window, renaming back would
            // fail and the fresh holder would be left writing
            // unprotected (its release a silent no-op). Fail loudly —
            // the operator restores the .broken file by hand — rather
            // than silently unserializing the store.
            if (!f.rename(aside, lease))
              throw new IllegalStateException(
                s"$dir: raced while breaking a stale lease — renamed a " +
                  s"FRESH holder's lease to ${aside.getName} and could " +
                  "not restore it (a third writer claimed claims/LEASE " +
                  "in between). The store may now have two writers; " +
                  s"restore ${aside.getName} to claims/LEASE manually.")
          }
        }
      case None => // fresh, unreadable, or gone — never break
    }
    throw new IllegalStateException(
      s"$dir: another writer holds the single-writer lease " +
        s"(claims/LEASE); $why Retry after it finishes, or delete a " +
        "stale lease.")
  }

  /** Stale-lease break for stores with NO atomic rename but WITH
    * server-enforced conditional create (VERDICT r12 #2 — AWS S3 with
    * If-None-Match, GCS, ABFS; probed/asserted via
    * [[EstateFs.conditionalCreateCapable]]).
    *
    * Arbitration WITHOUT rename: the one break "ticket" for lease
    * generation `observed` is `claims/LEASE.break.<sha(observed)>`,
    * created conditionally — two racing breakers both observe the same
    * stale token, the store lets exactly ONE create the ticket, the
    * loser refuses. Lease tokens are fresh UUIDs per acquire, so a
    * ticket is forever keyed to its dead generation and can never
    * authorize breaking a later lease. The winner then re-verifies the
    * lease still carries `observed` (a released-and-reacquired lease
    * must not be stolen — if it changed, the live holder keeps it and
    * we refuse), records the broken token as `claims/LEASE.broken.*`
    * for the commit fencing audit ([[graft.TextIndex]]'s `by`-marker
    * discard reads those), deletes the stale lease, and claims.
    *
    * Residual windows, both documented rather than closed:
    *  - verify-then-delete is check-then-act — a ZOMBIE holder
    *    releasing in the instant between the winner's re-read and its
    *    delete loses its successor's lease. The rename arm closes this
    *    window; conditional create alone cannot. Downstream damage is
    *    what the `by`-token commit fencing exists to catch.
    *  - a breaker that CRASHES between its ticket create and the lease
    *    delete leaves ticket + stale lease behind; later breakers
    *    refuse with operator guidance naming both files (no auto
    *    ticket takeover — delete-then-recreate between two new
    *    breakers is itself unarbitrable without rename). */
  private def breakWithConditionalCreate(
      f: org.apache.hadoop.fs.FileSystem, dir: String, observed: String,
      token: String, why: String): String = {
    val lease = leasePath(dir)
    val gen = java.security.MessageDigest.getInstance("SHA-256")
      .digest(observed.getBytes("UTF-8"))
      .take(8).map(b => "%02x".format(b & 0xff)).mkString
    val ticket = s"$dir/claims/LEASE.break.$gen"
    if (!EstateFs.createExclusive(ticket, token))
      throw new IllegalStateException(
        s"$dir: another breaker holds the break ticket for this stale " +
          s"lease generation ($ticket). If that breaker is still " +
          "running, retry after it finishes; if it crashed mid-break, " +
          s"verify both writers are dead, then delete $ticket and " +
          s"$dir/claims/LEASE by hand and retry. $why")
    if (!leaseToken(f, lease).contains(observed)) {
      // the stale holder released and someone new acquired while we
      // arbitrated — the lease is LIVE; drop our now-dead ticket
      f.delete(new Path(ticket), false)
      throw new IllegalStateException(
        s"$dir: another writer re-acquired the single-writer lease " +
          s"while a stale one was being broken; $why Retry after it " +
          "finishes.")
    }
    // audit trail first: brokenTokens()/fencing must see the broken
    // token even if we crash between these steps
    EstateFs.createExclusive(
      s"$dir/claims/LEASE.broken.${java.util.UUID.randomUUID()}", observed)
    f.delete(lease, false)
    f.delete(new Path(ticket), false)
    if (EstateFs.createExclusive(lease.toString, token)) return token
    throw new IllegalStateException(
      s"$dir: another writer claimed the lease the instant a stale one " +
        s"was broken; $why Retry after it finishes.")
  }

  /** Commit-time ownership re-check (VERDICT r10 #2): a consolidation
    * that legitimately exceeded [[TtlMs]] while alive may have been
    * broken and overtaken — its staged tables share paths with the
    * successor's, so COMMITTING its marker would interleave two
    * writers' state. Call this immediately before each commit point
    * (marker rename / destructive swap): one lease-file read. Throws
    * if the lease no longer carries `token`.
    *
    * This is check-then-act with no fencing (ADVICE r11): the lease
    * can still be broken BETWEEN the verify and the commit write that
    * follows it, so it is a best-effort NARROWING of the overtake
    * window, not mutual exclusion at the commit instant. Protocols
    * that need a successor to detect a stale writer's late commit
    * carry the holder token inside the commit marker itself (see
    * TextIndex's `by` meta field) so the successor can refuse it. */
  def verifyHeld(spark: SparkSession, dir: String, token: String): Unit = {
    val held = leaseToken(fs(spark, dir), leasePath(dir))
    if (!held.contains(token))
      throw new IllegalStateException(
        s"$dir: writer lease lost before commit (held by " +
          s"${held.getOrElse("<nobody>")}) — this writer exceeded the " +
          s"${TtlMs / 60000} min TTL and was broken; aborting WITHOUT " +
          "committing. The successor (or a rerun) overwrites the " +
          "staged debris.")
  }

  /** Audit records older than this are GC'd by [[gcAuditRecords]] —
    * generous (7 days) against the 30-minute lease [[TtlMs]]: the
    * `by`-marker commit fencing only needs a broken token while the
    * overtaken zombie could still attempt its late commit, and a
    * zombie outliving this window by definition exceeded its TTL
    * ~336× with no live claim left to fence. */
  val AuditRetentionMs: Long = 7L * 24L * 3600L * 1000L

  /** Retention GC for the lease protocol's audit debris (VERDICT r13
    * next #7): a long-lived estate accumulates one
    * `claims/LEASE.broken.*` record per stale-lease break (kept for
    * the `by`-marker commit fencing and incident forensics) and, after
    * a breaker crash, orphan `claims/LEASE.break.*` tickets —
    * unbounded growth with no retirement path, the same shape chunk
    * TTL solves for data. Deletes both kinds once older than
    * `retentionMs`; returns the number removed.
    *
    * MUST be called while HOLDING the store's lease (the maintain
    * verbs do): under the lease, a pending break of the live
    * generation cannot coexist with this writer — `acquire` refuses
    * while a break ticket for a still-stale lease exists — so any
    * ticket older than the window is debris of a RESOLVED generation
    * (its breaker crashed after deleting the stale lease), and
    * GC'ing it can never erase live arbitration state. */
  def gcAuditRecords(spark: SparkSession, dir: String,
      retentionMs: Long = AuditRetentionMs): Int = {
    val f = fs(spark, dir)
    val now = System.currentTimeMillis()
    EstateFs.listNames(s"$dir/claims").count { n =>
      (n.startsWith("LEASE.broken.") || n.startsWith("LEASE.break.")) && {
        val p = new Path(s"$dir/claims/$n")
        scala.util.Try(f.getFileStatus(p)).toOption
          .exists(st => now - st.getModificationTime > retentionMs) &&
          scala.util.Try(f.delete(p, false)).getOrElse(false)
      }
    }
  }

  /** Refresh the lease's staleness evidence (mtime) — a long-lived
    * holder (a visit pipeline run spanning a whole night) calls this
    * at each unit of work so it never LOOKS abandoned to a breaker:
    * [[TtlMs]] measures silence, not runtime. Touches only a lease
    * still carrying `token` (check-then-touch — a lost race at worst
    * refreshes a successor's ALREADY-fresh lease by milliseconds,
    * which changes no arbitration decision). */
  def heartbeat(spark: SparkSession, dir: String, token: String): Unit = {
    val f = fs(spark, dir)
    val p = leasePath(dir)
    if (leaseToken(f, p).contains(token))
      scala.util.Try(f.setTimes(p, System.currentTimeMillis(), -1)): Unit
  }

  /** Release ONLY our own lease: if the file no longer carries our
    * token (a breaker legitimately took over after our TTL expired),
    * leave it alone — deleting by path would evict the new holder. */
  def release(spark: SparkSession, dir: String, token: String): Unit = {
    val f = fs(spark, dir)
    if (leaseToken(f, leasePath(dir)).contains(token))
      f.delete(leasePath(dir), false)
  }
}
