package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scratch-store reclamation contract (r13 advice): per-pid
  * store paths fixed the concurrent-writer overwrite but made orphans
  * unreclaimable by name, so every JVM now (a) sweeps trees whose
  * embedded pid is dead at first storePath use and (b) deletes its own
  * trees at exit. Orphans from kill -9'd runs cannot accumulate. */
class ScratchSpec extends AnyFunSuite {

  private val root = java.nio.file.Paths.get(
    sys.env.getOrElse("SPARK_GRAFT_SCRATCH", System.getProperty("java.io.tmpdir")))

  test("storePath embeds this pid and a 16-hex slug") {
    val p = Scratch.storePath("sigstore", "some|memo|key")
    val name = java.nio.file.Paths.get(p).getFileName.toString
    assert(name == s"graft-sigstore-p${ProcessHandle.current().pid()}-${Scratch.slug("some|memo|key")}")
    assert(Scratch.slug("some|memo|key").matches("[0-9a-f]{16}"))
  }

  test("dead-pid sweep deletes an orphan tree but never a live-pid or foreign dir") {
    // a pid that cannot be alive: beyond pid_max on any Linux config
    val deadPid = 4194304L + 7L
    val orphan = root.resolve(s"graft-sigstore-p$deadPid-" + "ab" * 8)
    val ownPath = java.nio.file.Paths.get(Scratch.storePath("sigstore", "scratch-spec-live"))
    val foreign = root.resolve("graft-unrelated-dir")
    java.nio.file.Files.createDirectories(orphan.resolve("part"))
    java.nio.file.Files.createDirectories(ownPath)
    java.nio.file.Files.createDirectories(foreign)
    try {
      Scratch.sweepDeadNow()
      assert(!java.nio.file.Files.exists(orphan), "dead-pid orphan must be swept")
      assert(java.nio.file.Files.exists(ownPath), "this process's live tree must survive")
      assert(java.nio.file.Files.exists(foreign), "non-matching names must be untouched")
    } finally {
      Seq(orphan, ownPath.resolve("x"), ownPath, foreign).foreach(p =>
        try java.nio.file.Files.deleteIfExists(p)
        catch { case scala.util.control.NonFatal(_) => () })
    }
  }
}
