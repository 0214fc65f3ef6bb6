package graft.core

/** Scratch-store paths for memoized derived artifacts (sigstore,
  * labelstore, bucket/part/agg/evo stores).
  *
  * Each ensure* builder memoizes per process (a ConcurrentHashMap
  * keyed by corpus dir, plus session identity where the store embeds
  * session-level read confs) and writes with mode("overwrite"). The
  * path must therefore be unique PER WRITER, or two concurrent
  * runners over the same corpus — or two memo keys colliding on a
  * short hash — overwrite the store another runner is mid-read
  * (the r12 advice finding). Uniqueness here comes from:
  *  - the JVM pid: concurrent processes never share a path, and a
  *    fresh process always rebuilds (its memo map starts empty), so a
  *    stale half-written store from a crashed run is never read;
  *  - 16 hex chars of md5(memo key): two keys sharing a path within
  *    one process is effectively impossible (vs the previous 32-bit
  *    murmur slug).
  * Cost: one store copy per (process, key) under the scratch root
  * (SPARK_GRAFT_SCRATCH, default java.io.tmpdir) instead of one per
  * corpus — sf-scale artifacts in an ephemeral dir. */
object Scratch {
  /** 16 hex chars of md5(memoKey) — also safe inside catalog table
    * names (letters/digits only). */
  def slug(memoKey: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(memoKey.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)

  def storePath(kind: String, memoKey: String): String =
    java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_SCRATCH", System.getProperty("java.io.tmpdir")))
      .resolve(s"graft-$kind-p${ProcessHandle.current().pid()}-${slug(memoKey)}").toString
}
