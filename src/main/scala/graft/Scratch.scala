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
  * All scratch lives under ONE per-process directory (unique name, so
  * concurrent users/processes never collide on ownership) that a
  * shutdown hook removes recursively — tmpfs is RAM, and leaking
  * staged tables across runs would ratchet memory instead of disk.
  */
object Scratch {
  /** Minimum usable tmpfs space before we trust it: covers staged
    * tables + stream checkpoints at every test SF with wide margin
    * (constrained containers often mount /dev/shm at 64 MB).
    */
  private val minShmBytes = 8L << 30

  private val base: Option[Path] = {
    val shm = Paths.get("/dev/shm")
    try {
      if (Files.isDirectory(shm) && Files.isWritable(shm)
          && shm.toFile.getUsableSpace >= minShmBytes) {
        val d = Files.createTempDirectory(shm, "graft_scratch_")
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          try
            Files.walk(d).sorted(Comparator.reverseOrder[Path]())
              .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
          catch { case _: Exception => () }))
        Some(d)
      } else None
    } catch { case _: Exception => None }
  }

  /** A fresh throwaway directory, on tmpfs when possible. */
  def dir(prefix: String): Path = base match {
    case Some(b) => Files.createTempDirectory(b, prefix)
    case None    => Files.createTempDirectory(prefix)
  }
}
