package graft.sources

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Local-filesystem helpers for SCRATCH state only — gate-local
  * streaming checkpoints and temp corpora whose lifetime is one
  * catalog entry on this box. The persistent swap-based writers
  * ([[graft.operators.Upsert]], [[LayerWriter.compactFact]]) do NOT
  * use this: they go through the Hadoop `FileSystem` API via
  * [[SwapFs]] so the same code deploys on HDFS/object stores. */
object LocalFs {
  def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }
    // a scratch dir the caller cleaned up no longer needs the exit
    // backstop — drop it so the pending set stays O(live dirs)
    pendingScratch.remove(p)
  }

  /** Scratch dirs created but not yet cleaned up. ONE static shutdown
    * hook drains this set — per-call `addShutdownHook` would register
    * (and strongly retain) a new Thread per scratch dir for the life
    * of the JVM, so a bench sweep or long-lived service accumulates
    * hooks without bound. */
  private val pendingScratch =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  private lazy val scratchHook: Unit = {
    sys.addShutdownHook(pendingScratch.forEach(p => deleteRecursively(p)))
    ()
  }

  /** Scratch directory for gate-local streaming state, preferring a
    * RAM-backed filesystem (`/dev/shm`) over the disk-backed tmpdir.
    * A streaming micro-batch commit is a burst of small-file creates +
    * fsyncs (offset log, state-store delta, commit log, sink
    * metadata); on disk those fsyncs ARE the gates' fixed overhead —
    * the data volume is tiny by design. The scratch state is deleted
    * before the query returns, so durability is irrelevant here; a
    * production stream points its checkpoint at durable storage and
    * pays that cost deliberately. */
  def scratchDir(prefix: String): Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val dir =
      if (Files.isDirectory(shm) && Files.isWritable(shm))
        Files.createTempDirectory(shm, prefix)
      else Files.createTempDirectory(prefix)
    // Best-effort backstop: RAM-backed scratch leaked on a failure
    // path is leaked MEMORY that outlives the query — reclaim at JVM
    // exit (no-op when the caller's own cleanup already ran, which
    // removes the dir from the pending set).
    scratchHook
    pendingScratch.add(dir)
    dir
  }
}
