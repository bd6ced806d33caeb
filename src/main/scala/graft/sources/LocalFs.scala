package graft.sources

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Local-filesystem helpers shared by the swap-based writers
  * ([[graft.operators.Upsert]], [[LayerWriter.compactFact]]) and the
  * scratch-directory catalog queries. Local-only by design: the swap
  * protocol relies on same-volume atomic renames, which object stores
  * don't provide — a production deployment swaps table-format
  * snapshots instead. */
object LocalFs {
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }
}
