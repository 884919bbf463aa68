package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Ephemeral scratch space for replay checkpoints, staging, and
  * roundtrip sinks. Prefers the memory-backed `/dev/shm` when present:
  * streaming micro-batch commits are fsync-heavy small-file I/O, and
  * paying disk latency for throwaway single-node replay scratch
  * measures the filesystem, not the engine. On a real cluster the
  * checkpoint location is a durable DFS/object-store path by design —
  * this helper only decides where LOCAL throwaway scratch lives, and
  * falls back to `java.io.tmpdir` when tmpfs is absent, too small, or
  * not writable.
  *
  * Lifecycle: ALL scratch (tmpfs or fallback) lives under one
  * per-process base directory — named with this JVM's pid — that a
  * shutdown hook removes recursively. Crashed JVMs can't run hooks, so
  * init also sweeps sibling `graft_scratch_<pid>_*` dirs whose pid is
  * dead (`/proc/<pid>` gone): tmpfs is RAM, and orphans from killed
  * runs would ratchet resident memory until the space check flipped
  * everyone to disk.
  */
object Scratch {
  /** Minimum usable tmpfs space before we trust it: covers staged
    * tables + stream checkpoints at every test SF with wide margin
    * (constrained containers often mount /dev/shm at 64 MB).
    */
  private val minShmBytes = 8L << 30

  private def deleteTree(d: Path): Unit =
    Files.walk(d).sorted(Comparator.reverseOrder[Path]())
      .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })

  /** Reclaim scratch left by JVMs that died without running their
    * shutdown hook. Only dirs following our own naming scheme with a
    * provably-dead pid are touched; skipped silently off-Linux.
    */
  private def sweepOrphans(parent: Path): Unit =
    try {
      val proc = Paths.get("/proc")
      if (!Files.isDirectory(proc)) return
      val ls = Files.list(parent)
      try ls.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("graft_scratch_")) {
          val pid = n.stripPrefix("graft_scratch_").takeWhile(_.isDigit)
          if (pid.nonEmpty && !Files.exists(proc.resolve(pid)))
            try deleteTree(p) catch { case _: Exception => () }
        }
      } finally ls.close()
    } catch { case _: Exception => () }

  private val base: Path = {
    val shm = Paths.get("/dev/shm")
    val parent =
      try {
        if (Files.isDirectory(shm) && Files.isWritable(shm)
            && shm.toFile.getUsableSpace >= minShmBytes) shm
        else Paths.get(sys.props("java.io.tmpdir"))
      } catch { case _: Exception => Paths.get(sys.props("java.io.tmpdir")) }
    sweepOrphans(parent)
    val d = Files.createTempDirectory(parent,
      s"graft_scratch_${ProcessHandle.current().pid()}_")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try deleteTree(d) catch { case _: Exception => () }))
    d
  }

  /** A fresh throwaway directory, on tmpfs when possible. */
  def dir(prefix: String): Path = Files.createTempDirectory(base, prefix)
}
