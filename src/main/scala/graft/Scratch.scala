package graft

import java.nio.file.{Files, Path, Paths}

/** Ephemeral scratch space for replay checkpoints, staging, and
  * roundtrip sinks. Prefers the memory-backed `/dev/shm` when present:
  * streaming micro-batch commits are fsync-heavy small-file I/O, and
  * paying disk latency for throwaway single-node replay scratch
  * measures the filesystem, not the engine. On a real cluster the
  * checkpoint location is a durable DFS/object-store path by design —
  * this helper only decides where LOCAL throwaway scratch lives, and
  * falls back to `java.io.tmpdir` when no tmpfs is available.
  */
object Scratch {
  private val base: Option[Path] = {
    val shm = Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) {
      val d = shm.resolve("graft_scratch")
      try { Files.createDirectories(d); Some(d) }
      catch { case _: Exception => None }
    } else None
  }

  /** A fresh throwaway directory, on tmpfs when possible. */
  def dir(prefix: String): Path = base match {
    case Some(b) => Files.createTempDirectory(b, prefix)
    case None    => Files.createTempDirectory(prefix)
  }
}
