package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Memoization for small trained model artifacts (IVF centroids, PQ
  * codebooks): in production a trained quantizer is a persisted asset
  * maintained next to the corpus, not retrained per query — the same
  * staging discipline as the bucketed sinks and the incremental-dedup
  * index, applied to driver-held artifacts.
  *
  * The key hashes the frame's CANONICALIZED logical plan (two different
  * subspace slices of the same file must not collide) plus its input
  * files and their mtimes (a regenerated file invalidates), plus a tag
  * carrying the training hyperparameters. Training is deterministic
  * (integer Lloyd, md5-ordered seeds), so the memo is semantically
  * transparent. Frames with no file lineage (in-memory test data) skip
  * staging and always train fresh. Artifacts round-trip via Java
  * serialization to an atomically-moved tmp file; the in-JVM map keeps
  * re-reads free within a sweep.
  */
object ModelStaging {
  private val mem = scala.collection.concurrent.TrieMap.empty[String, AnyRef]

  private def keyOf(df: DataFrame, tag: String): Option[String] = {
    val files = try df.inputFiles catch { case _: Throwable => Array.empty[String] }
    if (files.isEmpty) None
    else try {
      val plan = df.queryExecution.analyzed.canonicalized.toString
      val sig = files.sorted.map { f =>
        // URI parse inside the guard (ADVICE r5 #2): a path needing URI
        // escaping (spaces etc.) degrades to fresh training, not a throw
        val p = Paths.get(new java.net.URI(f).getPath)
        val m = try Files.getLastModifiedTime(p).toMillis catch { case _: Throwable => -1L }
        s"$p:$m"
      }.mkString(";")
      Some(java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"$tag|$plan|$sig".getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString)
    } catch { case _: Throwable => None }
  }

  /** Per-user private staging directory (0700): artifacts deserialize at
    * readObject time, so a world-writable shared path would let a
    * pre-planted file execute code in this JVM (ADVICE r5 #2). */
  private lazy val stageDir: java.nio.file.Path = {
    val d = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_stage_${sys.props.getOrElse("user.name", "anon")}")
    Files.createDirectories(d)
    try {
      import java.nio.file.attribute.PosixFilePermissions
      Files.setPosixFilePermissions(d, PosixFilePermissions.fromString("rwx------"))
    } catch { case _: UnsupportedOperationException => () } // non-POSIX FS
    d
  }

  /** Deserialization allowlist: model artifacts are primitive arrays,
    * boxes and graft case classes — anything else in the stream is an
    * attack, not an artifact. */
  private val deserFilter = java.io.ObjectInputFilter.Config.createFilter(
    "graft.**;scala.**;java.lang.*;java.util.*;maxdepth=20;maxrefs=1000000;!*")

  def memo[T <: Serializable](df: DataFrame, tag: String)(build: => T): T =
    keyOf(df, tag) match {
      case None => build
      case Some(k) =>
        mem.get(k) match {
          case Some(v) => v.asInstanceOf[T]
          case None =>
            val file = stageDir.resolve(s"graft_model_$k.bin")
            val v: T =
              if (Files.exists(file)) {
                val in = new java.io.ObjectInputStream(Files.newInputStream(file))
                in.setObjectInputFilter(deserFilter)
                try in.readObject().asInstanceOf[T] finally in.close()
              } else {
                val built = build
                val tmp = Files.createTempFile(stageDir, "graft_model", ".bin")
                val out = new java.io.ObjectOutputStream(Files.newOutputStream(tmp))
                try out.writeObject(built) finally out.close()
                Files.move(tmp, file, StandardCopyOption.REPLACE_EXISTING)
                built
              }
            mem.put(k, v.asInstanceOf[AnyRef])
            v
        }
    }
}
