package graft

import java.nio.channels.{FileChannel, OverlappingFileLockException}
import java.nio.file.{Paths, StandardOpenOption}

import org.scalatest.funsuite.AnyFunSuite

/** The harness mutex (VERDICT r14 #6): Verify, Bench, and the
  * sweep-running suites must be mutually exclusive across PROCESSES —
  * they share the /tmp export dumps and warehouse artifacts — while
  * same-JVM re-entry stays a no-op (one sbt-test JVM, many suites). */
class HarnessLockSpec extends AnyFunSuite {
  test("tryAcquire is idempotent within a JVM and stamps the lock file " +
    "at the repo root — OUTSIDE the swept warehouse tree (ADVICE r15: " +
    "a sweep deleting a held lock file would let a second process " +
    "'acquire' and void mutual exclusion)") {
    assert(HarnessLock.tryAcquire("spec"))
    assert(HarnessLock.tryAcquire("spec-reentry"),
      "same-JVM re-entry must succeed (suites share one acquisition)")
    assert(new java.io.File(".graft-harness.lock").exists(),
      "lock file must exist at the repo root")
    assert(!new java.io.File("spark-warehouse/graft-harness.lock").exists(),
      "the lock must no longer live under the swept warehouse tree")
  }

  test("the lock is held at the OS level (a second holder would lose)") {
    assert(HarnessLock.tryAcquire("spec"))
    // A second channel in THIS JVM sees OverlappingFileLockException —
    // the same condition a second PROCESS would see as tryLock() == null
    // (tryAcquire maps both to false/fail-fast).
    val ch = FileChannel.open(
      Paths.get(".graft-harness.lock"),
      StandardOpenOption.WRITE)
    try intercept[OverlappingFileLockException](ch.tryLock())
    finally ch.close()
  }
}
