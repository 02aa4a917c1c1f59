package graft.streaming

import java.nio.file.{Files, Path}

/** Crash discipline for the memoized streaming runs (the `_DONE`-marked
  * tmp dirs): a first run killed mid-stream leaves a half-written base —
  * staged input files, a live checkpoint, partial sink output — and a
  * naive retry that re-APPENDS its staging while resuming the old
  * checkpoint duplicates every row in the memoized sink FOREVER (the
  * oracle then fails until someone deletes the tmp dir by hand). The
  * rule: absent `_DONE`, the whole base is garbage — wipe it and rebuild
  * from scratch. The `_DONE` write is the commit point; everything
  * before it must be disposable. */
object StagedRuns {

  /** Content key for staged assets/runs: SHA-256 of the raw key string,
    * first 8 bytes as hex — ONE recipe for every staging site, so a key
    * change (a new field, a version bump) can't drift between a producer
    * and a spec that re-derives its dir. */
  def contentKey(raw: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(raw.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString

  /** Prepare `base` for a (re-)run: if the completion marker is absent,
    * remove any half-written remains, then ensure the dir exists. */
  def freshBase(base: Path, done: Path): Unit = {
    if (!Files.exists(done) && Files.exists(base)) {
      val walk = Files.walk(base)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
    Files.createDirectories(base)
  }
}
