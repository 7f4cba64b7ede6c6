package graft.ops

import java.nio.file.Files
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q_chunk_dedup / q_dup_chunks vs a local reference model on
  * ARBITRARY corpora — including exact copies, partial overlaps, and
  * sub-chunk docs, which the fixed testdata only samples. The local
  * model re-implements the semantics independently (Scala collections,
  * no Spark), so a convention drift in either chunking or keeper
  * election fails the property.
  */
object ChunkDedupProperties extends Properties("ops.chunkdedup") with SparkSpec {
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // each sample runs Spark jobs

  private val C = 10
  private val vocab = Vector("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op")

  private val genDoc: Gen[String] = for {
    n <- Gen.chooseNum(1, 35)
    toks <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield toks.mkString(" ")

  // corpora with forced exact copies so cross-doc dups always occur
  private val genCorpus: Gen[Seq[String]] = for {
    base <- Gen.nonEmptyListOf(genDoc).map(_.take(6))
    copies <- Gen.someOf(base)
  } yield base ++ copies

  private def chunksOf(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filterNot(_.isEmpty)
      .grouped(C).map(_.mkString(" ")).toSeq

  private def write(docs: Seq[String]): String = {
    val dir = Files.createTempDirectory("chunkprop").toString
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  property("kept chunks == globally distinct chunks; keeper is min (doc, idx)") =
    forAll(genCorpus) { docs =>
      val dir = write(docs)
      val out = TextAnalysis.queries("q_chunk_dedup")(spark, dir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val local = docs.map(chunksOf)
      val allChunks = local.flatten
      val distinct = allChunks.distinct
      // global conservation: one survivor per distinct chunk text
      val keptTotal = out.values.map(_._2).sum
      // per-doc chunk counts match the local chunking
      val countsOk = local.zipWithIndex.forall { case (ch, i) =>
        out(i.toLong)._1 == ch.length
      }
      // keeper election: doc 0's chunks are all first occurrences of
      // themselves unless an earlier chunk in doc 0 duplicates them
      val doc0Kept = chunksOf(docs.head).zipWithIndex
        .count { case (c, i) => !chunksOf(docs.head).take(i).contains(c) }
      keptTotal == distinct.size && countsOk &&
        out(0L)._2 == doc0Kept
    }

  property("dup ratio counts exactly the chunks shared across documents") =
    forAll(genCorpus) { docs =>
      val dir = write(docs)
      val out = TextAnalysis.queries("q_dup_chunks")(spark, dir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val local = docs.map(chunksOf)
      val docsPerChunk = local.zipWithIndex
        .flatMap { case (ch, i) => ch.distinct.map(_ -> i) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
      local.zipWithIndex.forall { case (ch, i) =>
        val expDup = ch.count(c => docsPerChunk(c) > 1)
        out(i.toLong) == ((ch.length.toLong, expDup.toLong))
      }
    }
}
