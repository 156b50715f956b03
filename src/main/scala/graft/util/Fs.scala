package graft.util

import java.nio.file.{Files, Path}

/** Tiny filesystem helpers shared by the state/streaming materializers.
  * The java.nio directory streams must be closed — leaking them accumulates
  * open file descriptors across repeated staging/rebuild calls in a
  * long-lived JVM.
  */
object Fs {

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }

  /** First entry in `dir` whose name ends with `suffix`. */
  def firstWithSuffix(dir: Path, suffix: String): Option[Path] = {
    val list = Files.list(dir)
    try {
      val it = list.filter(p => p.toString.endsWith(suffix)).findFirst()
      if (it.isPresent) Some(it.get) else None
    } finally list.close()
  }
}
