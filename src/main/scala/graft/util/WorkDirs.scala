package graft.util

/** Driver-local work dirs for the stream twins' staging/checkpoint
  * roots and the batch round-trip queries (CSV/sink round-trips, the
  * foreachBatch maintenance family).
  *
  * Before round 12 every twin invocation called
  * `Files.createTempDirectory(prefix)` directly and never cleaned up:
  * each verify/bench run left a full parquet staging copy of its input
  * table under /tmp (advice item, round 11). Now all per-invocation
  * dirs nest under ONE lazily-created JVM root with ONE shutdown hook
  * that removes the whole tree — the same discipline
  * [[graft.ops.Scratch]] and `Streams.stageRoot` already use for their
  * session-scoped roots. Within-run accumulation across repeated
  * invocations of the same twin is bounded by the Scratch-style memo
  * most twins already have; this hook bounds the across-run residue.
  *
  * Driver-local `java.nio.file` is correct here because these roots
  * are only ever used at local[*] (the twins' micro-batch sources and
  * checkpoints); a cluster deployment points the staging conf keys
  * (`spark.graft.stagingDir`, `spark.graft.scratchDir`) at a shared
  * filesystem instead and never reaches this path.
  */
object WorkDirs {
  private lazy val root: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft-work-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(): Unit
      }
      rm(d.toFile)
    }))
    d
  }

  /** A fresh dir under the hook-cleaned root. */
  def temp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toString
}
