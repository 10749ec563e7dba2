package graft

import java.nio.ByteBuffer
import java.nio.channels.{FileChannel, FileLock, OverlappingFileLockException}
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Coarse inter-process mutex for the harness entrypoints (VERDICT r14
  * #6): Verify, Bench, and the sweep-running test suites share mutable
  * filesystem state — the /tmp export dumps the DuckDB oracle globs and
  * the dir-hash-suffixed warehouse tables — and the only thing keeping
  * two of them from interleaving was runbook discipline (the q338
  * dev-time race: a concurrent suite's grace-0 sweep deleted a live
  * export dump mid-compare, observed twice in r14). This turns the rule
  * mechanical: one `java.nio` file lock at the REPO ROOT, acquired
  * at process start; a second process fails FAST with a clear message
  * instead of silently corrupting the winner's run.
  *
  * An OS file lock (not a marker file) so a crashed holder releases on
  * process death — no stale-lock cleanup path to get wrong. Same-JVM
  * re-entry is a no-op (Verify's dump and its later reads share one
  * process; suites in the one forked test JVM share one acquisition).
  *
  * The lock file deliberately lives OUTSIDE spark-warehouse/ (ADVICE
  * r15): the warehouse is exactly the tree the harness sweeps manage,
  * and a sweep (or manual rm) deleting the lock file while held would
  * let a second process re-create it and "acquire" successfully,
  * silently voiding mutual exclusion. The repo root is swept by
  * nothing. */
object HarnessLock {
  private val LockPath = ".graft-harness.lock"
  @volatile private var held: Option[(FileChannel, FileLock)] = None

  /** Try to take the harness lock for this JVM; false if another
    * process holds it. Idempotent within a JVM. */
  def tryAcquire(who: String): Boolean = synchronized {
    if (held.isDefined) return true
    val p = Paths.get(LockPath)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val ch = FileChannel.open(p, StandardOpenOption.CREATE,
      StandardOpenOption.WRITE)
    val lk =
      try ch.tryLock()
      catch { case _: OverlappingFileLockException => null }
    if (lk == null) { ch.close(); return false }
    ch.truncate(0)
    ch.write(ByteBuffer.wrap(
      s"$who pid=${ProcessHandle.current().pid()}\n".getBytes("UTF-8")))
    held = Some((ch, lk))
    true
  }

  /** Take the lock or exit(3) with a diagnosis — the Verify/Bench
    * entrypoint form ("concurrent second process fails fast"). */
  def acquireOrDie(who: String): Unit =
    if (!tryAcquire(who)) {
      System.err.println(
        s"[$who] another graft harness process holds $LockPath — " +
          "Verify, Bench, and sweep-running test suites are mutually " +
          "exclusive (they share /tmp export dumps and warehouse " +
          "artifacts). Wait for it to exit and re-run.")
      sys.exit(3)
    }
}
