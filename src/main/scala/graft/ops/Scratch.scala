package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped write-once scratch space for shared materialized
  * intermediates — the "first-class intermediate table" discipline
  * [[Dedup.sharedShinglePostings]] established: when several operators
  * (or several SUBTREES of one plan that Catalyst cannot collapse via
  * exchange reuse because column pruning makes the copies canonically
  * unequal) start from the same expensive derived table, a production
  * pipeline writes it once and every consumer scans the (far smaller)
  * file. Deterministic inputs ⇒ the round-trip changes no oracle hash.
  *
  * Keys must embed the applicationId (a second session in the same JVM
  * must never overwrite files a first session's lazy frames still
  * read); paths are md5-tagged so arbitrary key strings stay
  * filesystem-safe and injective.
  *
  * '''Cluster deployment''': the root honors `spark.graft.scratchDir`
  * — any Hadoop-compatible URI (shared FS, HDFS, object store) every
  * executor can reach; the parquet writer/reader handle the IO, no
  * driver-local java.io is involved for a configured root. Unset, the
  * root is a driver-local temp dir deleted on JVM exit — correct at
  * local[*] only. A configured root is NOT cleaned on exit (it is the
  * operator's storage); the applicationId in every key keeps sessions
  * from colliding, and old sessions' files are safe to expire
  * externally.
  */
private[ops] object Scratch {
  private val memo = scala.collection.concurrent.TrieMap.empty[String, String]
  // per-key build serialization: TrieMap.getOrElseUpdate only makes
  // the INSERT atomic — two threads racing one key would both run the
  // (side-effecting, expensive) build into the same path
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private val roots = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Conf key naming the shared scratch root (see class doc). */
  val ScratchDirConf = "spark.graft.scratchDir"

  private def root(s: SparkSession): String =
    roots.getOrElseUpdate(s.conf.get(ScratchDirConf, ""), {
      s.conf.get(ScratchDirConf, "") match {
        case "" =>
          val d = java.nio.file.Files.createTempDirectory("graft-scratch-")
          Runtime.getRuntime.addShutdownHook(new Thread(() => {
            def rm(f: java.io.File): Unit = {
              val cs = f.listFiles()
              if (cs != null) cs.foreach(rm)
              f.delete(): Unit
            }
            rm(d.toFile)
          }))
          d.toString
        case configured => configured
      }
    })

  /** Materialize `build` once per (applicationId, key) and return a
    * reader over the parquet — every later call is a file scan.
    */
  def materialize(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    // the resolved root is part of the memo identity: re-configuring
    // spark.graft.scratchDir mid-session must trigger a fresh build
    // under the new root, not silently serve paths from the old one
    val r = root(s)
    val full = s"${s.sparkContext.applicationId}_${r}_$key"
    val lock = locks.computeIfAbsent(full, _ => new Object)
    val path = lock.synchronized {
      memo.getOrElseUpdate(full, {
        val tag = java.security.MessageDigest.getInstance("MD5")
          .digest(full.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(20)
        val p = s"$r/$tag"
        build.write.mode("overwrite").parquet(p)
        p
      })
    }
    s.read.parquet(path)
  }
}
