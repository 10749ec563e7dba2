package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** The loud-epoch absolute-record protocol (VERDICT r15 #1), exercised
  * against a temp dir so the live repo pointer files are never touched.
  * The rules under test mirror SCALE.md "Loud-epoch absolute record":
  * arm on >= 6 trailing loud runs, pool >= 3 newest clean runs at the
  * same MEASURED-TREE id (commit-sha fallback for legacy lines),
  * median-of-medians record, quiet-run disarm, one-time archive of the
  * displaced quiet-gate record. */
class BenchPointerSpec extends AnyFunSuite {

  private val sha = "a" * 40
  private val other = "b" * 40
  // Measured-tree ids (the "tree" identity field): derived from the
  // commit here purely for test readability.
  private def treeOf(commit: String) = commit.take(8) + "-tree"

  private def line(quiet: Boolean, commit: String, dirty: Boolean,
                   total: Double, q1: Double, q1min: Double,
                   ts: Long = 1000L, n: Int = 2,
                   withTree: Boolean = true): String =
    s"""{"ts":$ts,"commit":"$commit",""" +
      (if (withTree) s""""tree":"${treeOf(commit)}",""" else "") +
      s""""dirty":$dirty,"quiet":$quiet,""" +
      s""""value":$total,"total_min":${total - 1},""" +
      s""""noise_rel_spread":0.25,"n_queries":$n,"cpus":32,""" +
      s""""queries":{"q1":$q1,"q2":1.0},""" +
      s""""queries_min":{"q1":$q1min,"q2":0.9}}"""

  private def withDir(body: Path => Unit): Unit = {
    val d = Files.createTempDirectory("benchptr")
    try body(d)
    finally {
      val fs = Files.walk(d).sorted(java.util.Comparator.reverseOrder())
      fs.forEach(p => Files.deleteIfExists(p))
      fs.close()
    }
  }

  private def seed(d: Path, lines: Seq[String]): Unit =
    Files.writeString(BenchPointer.historyPath(d),
      lines.mkString("", "\n", "\n"))

  test("below the drought threshold the fallback never fires") {
    withDir { d =>
      seed(d, (1 to 5).map(i => line(quiet = false, sha, dirty = false,
        100 + i, 1.0, 0.9)))
      assert(BenchPointer.maybeRefreshFromLoudEpoch(d, treeOf(sha), sha, 2).isEmpty)
      assert(!Files.exists(d.resolve("BENCH_last.json")))
    }
  }

  test("a quiet run anywhere in the tail disarms — the gold path " +
    "already owned that refresh") {
    withDir { d =>
      val loud = (1 to 8).map(i => line(quiet = false, sha, dirty = false,
        100 + i, 1.0, 0.9))
      // quiet run 3 entries from the end: trailing drought is only 3
      seed(d, loud.take(5) ++ Seq(line(quiet = true, sha, dirty = false,
        90, 1.0, 0.9)) ++ loud.drop(5))
      assert(BenchPointer.maybeRefreshFromLoudEpoch(d, treeOf(sha), sha, 2).isEmpty)
    }
  }

  test("armed drought + >=3 same-commit clean runs refreshes the " +
    "pointer with the median-of-medians and archives the quiet record " +
    "exactly once") {
    withDir { d =>
      // Existing quiet-gate record to displace.
      Files.writeString(d.resolve("BENCH_last.json"),
        """{"metric":"total","value":312.8}""")
      // 6 loud runs: 2 at a foreign commit (count toward the drought,
      // never pool), then 4 eligible at HEAD with distinct totals.
      seed(d,
        Seq(line(quiet = false, other, dirty = false, 500, 9.0, 8.0),
          line(quiet = false, other, dirty = false, 510, 9.0, 8.0)) ++
          Seq((230.0, 2.0, 1.7), (251.0, 2.6, 2.1), (278.0, 3.0, 2.4),
            (285.0, 3.2, 2.9)).zipWithIndex.map { case ((t, q, qm), i) =>
            line(quiet = false, sha, dirty = false, t, q, qm,
              ts = 2000L + i)
          })
      val rec = BenchPointer.maybeRefreshFromLoudEpoch(d, treeOf(sha), sha, 2)
      assert(rec.isDefined, "fallback must fire")
      val r = rec.get
      // median of (230, 251, 278, 285) = 264.5; never the foreign 500s
      assert(BenchPointer.jNum(r, "value").contains(264.5), r)
      // q1 = median of (2.0, 2.6, 3.0, 3.2) = 2.8; min-of-mins = 1.7
      assert(BenchPointer.jMap(r, "queries").get("q1").contains(2.8), r)
      assert(BenchPointer.jMap(r, "queries_min").get("q1").contains(1.7), r)
      assert(BenchPointer.jStr(r, "provenance")
        .contains("loud_epoch_median"), r)
      assert(r.contains("\"constituents\":["), r)
      assert(Files.readString(d.resolve("BENCH_last.json")).contains(
        "loud_epoch_median"))
      // the displaced quiet record is archived...
      assert(Files.readString(d.resolve("BENCH_last_quiet.json"))
        .contains("312.8"))
      // ...and a SECOND refresh must not clobber the archive with the
      // provenance record now sitting in BENCH_last.json
      BenchPointer.maybeRefreshFromLoudEpoch(d, treeOf(sha), sha, 2)
      assert(Files.readString(d.resolve("BENCH_last_quiet.json"))
        .contains("312.8"))
    }
  }

  test("dirty-tree and wrong-n_queries runs count toward the drought " +
    "but never pool as constituents") {
    withDir { d =>
      seed(d,
        (1 to 4).map(i => line(quiet = false, sha, dirty = true,
          100 + i, 1.0, 0.9)) ++
          Seq(line(quiet = false, sha, dirty = false, 200, 2.0, 1.8,
            n = 3)) ++ // full drought of 7, but only 2 clean at n=2
          (1 to 2).map(i => line(quiet = false, sha, dirty = false,
            150 + i, 1.5, 1.2)))
      assert(BenchPointer.maybeRefreshFromLoudEpoch(d, treeOf(sha), sha, 2).isEmpty)
    }
  }

  test("a docs-only commit mid-session does not split the pool: runs " +
    "with different HEAD shas but the SAME measured-tree id pool " +
    "together, and pre-tree-field lines fall back to commit identity") {
    withDir { d =>
      // Three runs at three different commits sharing one measured
      // tree (the r16 scenario: a records commit landed between runs),
      // plus three drought-padding runs at a foreign tree.
      val c1 = "c" * 40; val c2 = "d" * 40; val c3 = "e" * 40
      def sameTree(commit: String, total: Double, ts: Long): String =
        line(quiet = false, commit, dirty = false, total, total / 100,
          total / 100, ts = ts)
          .replace(s""""tree":"${treeOf(commit)}"""",
            s""""tree":"shared-tree"""")
      seed(d,
        (1 to 3).map(i => line(quiet = false, other, dirty = false,
          400 + i, 4.0, 3.9)) ++
          Seq(sameTree(c1, 300, 1L), sameTree(c2, 310, 2L),
            sameTree(c3, 320, 3L)))
      val rec = BenchPointer.maybeRefreshFromLoudEpoch(
        d, "shared-tree", c3, 2)
      assert(rec.isDefined, "same-tree runs across commits must pool")
      assert(BenchPointer.jNum(rec.get, "value").contains(310.0), rec.get)
    }
    withDir { d =>
      // Legacy lines (no tree field) still pool by commit sha.
      seed(d, (1 to 6).map(i => line(quiet = false, sha, dirty = false,
        200 + i, 2.0, 1.9, ts = i.toLong, withTree = false)))
      val rec = BenchPointer.maybeRefreshFromLoudEpoch(
        d, treeOf(sha), sha, 2)
      assert(rec.isDefined, "tree-less legacy lines must match by commit")
    }
  }

  test("an unknown commit never produces an absolute record") {
    withDir { d =>
      seed(d, (1 to 8).map(i => line(quiet = false, "unknown",
        dirty = false, 100 + i, 1.0, 0.9)))
      assert(BenchPointer.maybeRefreshFromLoudEpoch(d, "unknown", "unknown", 2)
        .isEmpty)
    }
  }

  test("history-line parsers: the two query maps extract separately " +
    "and flat fields never match inside them") {
    val l = line(quiet = false, sha, dirty = false, 123.5, 1.25, 1.0)
    assert(BenchPointer.jNum(l, "value").contains(123.5))
    assert(BenchPointer.jBool(l, "quiet").contains(false))
    assert(BenchPointer.jStr(l, "commit").contains(sha))
    assert(BenchPointer.jMap(l, "queries") ==
      Map("q1" -> 1.25, "q2" -> 1.0))
    assert(BenchPointer.jMap(l, "queries_min") ==
      Map("q1" -> 1.0, "q2" -> 0.9))
  }
}
