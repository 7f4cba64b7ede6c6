package graft.covid

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** High-watermark checkpoint module — the engine form of the
  * reference's two JSON cursor files (`last_processed_row`,
  * ingest_csv_to_elastic.py:24-33; `last_processed_date`,
  * dags/ETL.py:47-62).
  *
  * Divergences (SURVEY.md §2.8, deliberate):
  *  - max-seen semantics: the reference persists `batch[-1]["date"]`
  *    of an UNSORTED batch, which can jump past unread dates; we
  *    persist the max processed date.
  *  - commit order: data append happens BEFORE the watermark write, so
  *    a crash between the two re-reads a batch (at-least-once, same as
  *    the reference) but never skips one; pairing with the exact-dedup
  *    operator on (date,state,county) upgrades re-runs to
  *    effectively-once.
  *
  * Uses the Hadoop FileSystem API so the same code addresses local
  * disk, HDFS, or object stores; the write is temp-file + rename
  * (atomic on HDFS/local, best-effort on S3-like stores — there,
  * point this at a consistent store or use the Structured Streaming
  * pipeline whose checkpointLocation handles it).
  */
class Watermark(spark: SparkSession, dir: String, key: String = "last_processed_date") {
  private val hadoopConf = spark.sparkContext.hadoopConfiguration
  private val file = new Path(dir, "state.json")
  private def fs: FileSystem = file.getFileSystem(hadoopConf)

  private val KeyRe = ("\"" + java.util.regex.Pattern.quote(key) + "\"\\s*:\\s*\"([^\"]*)\"").r

  def load(): Option[String] = {
    if (!fs.exists(file)) None
    else {
      val in = fs.open(file)
      val body = try {
        new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          StandardCharsets.UTF_8)
      } finally in.close()
      KeyRe.findFirstMatchIn(body).map(_.group(1))
    }
  }

  def save(value: String): Unit = {
    val tmp = new Path(dir, s"state.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"$key": "$value"}""".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // Overwriting rename via FileContext — atomic replace on HDFS and
    // local FS. (delete-then-rename had a crash window that lost the
    // cursor entirely and re-extracted ALL history on the next run.)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(file.toUri, hadoopConf)
    fc.rename(tmp, file, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
}
