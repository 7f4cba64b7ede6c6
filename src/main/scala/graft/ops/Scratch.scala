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
  */
private[ops] object Scratch {
  private val memo = scala.collection.concurrent.TrieMap.empty[String, String]

  private lazy val root: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft-scratch-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(): Unit
      }
      rm(d.toFile)
    }))
    d
  }

  /** Materialize `build` once per (applicationId, key) and return a
    * reader over the parquet — every later call is a file scan.
    */
  def materialize(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val full = s"${s.sparkContext.applicationId}_$key"
    val path = memo.getOrElseUpdate(full, {
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(full.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(20)
      val p = root.resolve(tag).toString
      build.write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }
}
