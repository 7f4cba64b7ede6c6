package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class SourcesSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("S4/S5: create-if-not-exists external table, idempotent") {
    assert(!Warehouse.tableExists(spark, "orders_ext"))
    Warehouse.createIfNotExists(spark, "orders_ext", s"$dir/orders.parquet")
    Warehouse.createIfNotExists(spark, "orders_ext", s"$dir/orders.parquet") // no-op
    assert(Warehouse.tableExists(spark, "orders_ext"))
    assert(spark.table("orders_ext").count() == 1500)
  }

  test("S11: DDL bootstrap runs a script idempotently") {
    val ddl = Seq(
      s"CREATE TABLE IF NOT EXISTS nation_ext USING parquet LOCATION '$dir/nation.parquet'",
      "", // blank lines tolerated
      s"CREATE TABLE IF NOT EXISTS region_ext USING parquet LOCATION '$dir/region.parquet'")
    Warehouse.bootstrapDdl(spark, ddl)
    Warehouse.bootstrapDdl(spark, ddl) // re-run must not fail (unlike the reference's CREATE INDEX)
    assert(spark.table("nation_ext").count() == 25)
  }

  test("spark.sql front door over registered testdata views") {
    Warehouse.registerTestdata(spark, dir)
    val n = spark.sql(
      "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0)
    assert(n == 6000)
  }

  test("ORC warehouse parity: round-trip preserves data, filters reach the scan") {
    // the warehouse is parquet-first, but every sink/scan in the
    // engine goes through the DataSource V1/V2 API — ORC is the same
    // call with a different format string, and predicate pushdown
    // must survive the switch (searchArgument in the scan).
    val out = java.nio.file.Files.createTempDirectory("orc").toString + "/t"
    val orders = graft.Tables(spark, dir, "orders")
    orders.write.orc(out)
    val back = spark.read.orc(out)
    assert(back.count() == orders.count())
    def checksum(df: org.apache.spark.sql.DataFrame) =
      df.agg(graft.util.Exact.moneySum(col("o_totalprice"))).head().getDouble(0)
    assert(checksum(back) == checksum(orders))
    val filtered = back.where(col("o_orderkey") === 42L)
    val scan = filtered.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PushedFilters") &&
      scan.toLowerCase.contains("equalto(o_orderkey,42"),
      s"o_orderkey filter not pushed into the ORC scan:\n$scan")
  }

  test("compaction rewrites many small files to few, preserving data") {
    val out = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val orders = graft.Tables(spark, dir, "orders")
    orders.repartition(37).write.parquet(out) // fragmented table
    assert(Layout.fileCount(spark, out) == 37)
    // decimal sum: a double sum is accumulation-order-dependent and
    // the whole point of compaction is changing the partition layout
    def checksum() = spark.read.parquet(out)
      .agg(graft.util.Exact.moneySum(col("o_totalprice"))).head().getDouble(0)
    val before = checksum()
    Layout.compact(spark, out, 2)
    assert(Layout.fileCount(spark, out) == 2)
    val after = checksum()
    assert(spark.read.parquet(out).count() == 1500)
    assert(before == after)
  }

  test("sorted write clusters key ranges into single files") {
    val out = java.nio.file.Files.createTempDirectory("sorted").toString + "/t"
    Layout.writeSorted(graft.Tables(spark, dir, "orders"), out, "o_orderkey", 10)
    // all rows of a narrow key range land in ONE file's band — the
    // clustering that makes parquet min/max stats selective (row-group
    // skipping happens inside the reader; this asserts the layout that
    // enables it)
    val q = spark.read.parquet(out).filter(col("o_orderkey").between(100, 110))
    assert(q.count() == 11)
    val picked = q.select(input_file_name()).distinct().count()
    assert(picked == 1, s"range rows spread over $picked files, want 1")
  }

  test("z-order write gives narrow per-file bands on BOTH dimensions") {
    val orders = graft.Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"))
    // per-file normalized band width of a column, averaged over files
    def avgBand(out: String, c: String): Double = {
      val dom = orders.agg(max(col(c)) - min(col(c))).head().getLong(0).toDouble
      val bands = spark.read.parquet(out)
        .groupBy(input_file_name())
        .agg(((max(col(c)) - min(col(c))) / dom).as("w"))
        .collect().map(_.getDouble(1))
      bands.sum / bands.length
    }
    val zOut = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    Layout.writeZOrdered(orders, zOut, "o_custkey", "o_orderkey", 16)
    assert(spark.read.parquet(zOut).count() == orders.count())
    // single-dim sort: first dim tight, second dim ~full range per file
    val sOut = java.nio.file.Files.createTempDirectory("sorted1").toString + "/t"
    Layout.writeSorted(orders, sOut, "o_custkey", 16)
    val (z1, z2) = (avgBand(zOut, "o_custkey"), avgBand(zOut, "o_orderkey"))
    val s2 = avgBand(sOut, "o_orderkey")
    assert(z1 < 0.5 && z2 < 0.5,
      s"z-order bands not narrow on both dims: ($z1, $z2)")
    assert(z2 < s2 / 2,
      s"z-order dim-2 band $z2 not better than single-sort's $s2")
  }

  test("bucketed co-located join plans without an exchange") {
    Bucketing.writeBucketed(
      graft.Tables(spark, dir, "orders"), "orders_b", "o_orderkey")
    Bucketing.writeBucketed(
      graft.Tables(spark, dir, "lineitem"), "lineitem_b", "l_orderkey")
    // at sf0.001 the planner (rightly) broadcasts the tiny table and
    // skips bucketing; force the merge path to expose the co-location
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "lineitem_b", "orders_b",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it computes the right thing
      assert(joined.count() == 6000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucket pruning: a bucket-key point lookup reads 1 of N buckets") {
    // the point-lookup path at 100 TB: an equality filter on the
    // bucketing key hashes to exactly one bucket, so the scan opens
    // 1/N of the files — no index, just layout
    Bucketing.writeBucketed(
      graft.Tables(spark, dir, "orders"), "orders_bp", "o_orderkey")
    // autoBucketedScan turns the bucketed layout off for scans with no
    // interesting-partitioning consumer — the point-lookup prune needs
    // the bucketed scan itself
    val prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val q = spark.table("orders_bp").where(col("o_orderkey") === 42L)
      val scanStr = q.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString("\n")
      assert(scanStr.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning missing from scan:\n$scanStr")
      assert(q.count() == 1)
    } finally spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
  }

  test("dynamic partition pruning: dim-side filter prunes fact partitions at runtime") {
    // The 100 TB layout story: a fact table partitioned by month joined
    // to a filtered dim must only READ the qualifying partitions —
    // Spark's DPP injects the dim's build-side keys as a runtime
    // partition filter into the fact scan. Assert the plan carries the
    // dynamicpruning expression so a layout regression can't silently
    // turn this back into a full scan.
    val tmp = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    graft.Tables(spark, dir, "orders")
      .withColumn("om", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("om").parquet(tmp)
    val fact = spark.read.parquet(tmp)
    val m = fact.agg(max(col("om"))).head().getString(0) // a month that exists
    import spark.implicits._
    // the dim must be a real scan with a Filter node — an in-memory
    // LocalRelation constant-folds the predicate away and the pruning
    // rule no longer sees a selective build side
    Seq((m, "target"), ("0000-00", "other")).toDF("om", "tag")
      .write.mode("overwrite").parquet(s"$tmp-dim")
    val dim = spark.read.parquet(s"$tmp-dim")
    val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    try {
      // tiny local test data defeats the stats-based benefit estimate;
      // production-scale facts pass it naturally
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      val q = fact.join(dim.where(col("tag") === "target"), "om")
        .select(col("o_orderkey"), col("om"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"), plan)
      assert(q.count() > 0)
    } finally
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", prev)
  }

  test("runtime bloom filter: selective dim filter prunes fact rows pre-shuffle") {
    // The row-level sibling of DPP: for a shuffled join with a
    // selective build side, Spark injects a bloom-filter semi-join
    // onto the probe scan so non-joining rows die before the
    // exchange. At 100 TB this is the difference between shuffling
    // the whole fact table and shuffling the ~matching slice.
    val tmp = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    graft.Tables(spark, dir, "orders").write.mode("overwrite").parquet(s"$tmp/fact")
    graft.Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$tmp/dim")
    val fact = spark.read.parquet(s"$tmp/fact")
    val dim = spark.read.parquet(s"$tmp/dim").where(col("c_mktsegment") === "BUILDING")
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val q = fact.join(dim, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"), plan)
      assert(q.count() > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("graftsink DSv2 write: commit publishes atomically, append accumulates") {
    val out = java.nio.file.Files.createTempDirectory("gsink").toString
    val src = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("id"), col("o_custkey"),
        col("o_totalprice"), col("o_orderpriority"))
      .where(col("id") <= 100)
    src.write.format("graftsink").option("path", out).mode("overwrite").save()
    val back = spark.read.format("graftsink").load(out)
    assert(back.count() == src.count())
    // content round-trips exactly (schema carried by the manifest DDL)
    assert(back.orderBy("id").collect().toSeq ==
      src.orderBy("id").collect().toSeq)
    // append carries the previous manifest's files forward
    val more = src.withColumn("id", col("id") + 1000000L)
    more.write.format("graftsink").option("path", out).mode("append").save()
    assert(spark.read.format("graftsink").load(out).count() == 2 * src.count())
    // overwrite truncates back to one generation
    src.write.format("graftsink").option("path", out).mode("overwrite").save()
    assert(spark.read.format("graftsink").load(out).count() == src.count())
  }

  test("graftsink legacy (ddl + files) manifest: readable, append migrates in place") {
    val out = java.nio.file.Files.createTempDirectory("gsink_legacy").toString
    val src = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("id"), col("o_totalprice"))
      .where(col("id") <= 50)
    src.write.format("graftsink").option("path", out).mode("overwrite").save()
    // rewrite the manifest in the pre-segment v1 format: one DDL line
    // followed by the cumulative data-file list, no header/gen/checksum
    val m = GraftSink.readManifest(out).get
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, GraftSink.ManifestName),
      (m.ddl +: m.files).mkString("\n"))
    m.segments.foreach(sg => new java.io.File(out, sg).delete())
    // legacy table reads as-is
    assert(spark.read.format("graftsink").load(out).count() == src.count())
    // append on top materializes the legacy list as a migration
    // segment and publishes a v2 manifest — nothing is lost
    val more = src.withColumn("id", col("id") + 1000000L)
    more.write.format("graftsink").option("path", out).mode("append").save()
    assert(spark.read.format("graftsink").load(out).count() == 2 * src.count())
    val upgraded = GraftSink.readManifest(out).get
    assert(upgraded.gen == 1L && upgraded.segments.size == 2,
      s"expected migration + commit segments, got $upgraded")
  }

  test("graftsink DSv2 append: a mismatched schema is rejected, table untouched") {
    // decode is positional — appending a re-ordered/re-typed frame
    // would silently re-type the carried-forward generation, so the
    // commit must fail loudly and the abort must clean its files
    val out = java.nio.file.Files.createTempDirectory("gsink_schema").toString
    val src = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("id"), col("o_totalprice"))
      .where(col("id") <= 50)
    src.write.format("graftsink").option("path", out).mode("overwrite").save()
    val committed = spark.read.format("graftsink").load(out)
      .orderBy("id").collect().toSeq
    intercept[Exception] {
      src.select(col("o_totalprice"), col("id")) // re-ordered columns
        .write.format("graftsink").option("path", out).mode("append").save()
    }
    assert(spark.read.format("graftsink").load(out)
      .orderBy("id").collect().toSeq == committed)
    val live = GraftSink.readManifest(out).get.files.toSet
    val onDisk = new java.io.File(out).listFiles()
      .map(_.getName).filter(_.endsWith(".gsink")).toSet
    assert(onDisk == live, "rejected append must leave no orphan files")
  }

  test("graftsink DSv2 abort: a mid-write task failure leaves the table untouched") {
    val out = java.nio.file.Files.createTempDirectory("gsink_abort").toString
    val src = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("id"), col("o_totalprice"))
      .where(col("id") <= 100)
    src.write.format("graftsink").option("path", out).mode("overwrite").save()
    val committed = spark.read.format("graftsink").load(out)
      .orderBy("id").collect().toSeq
    // the injected failure (writer throws at id=50) must abort the job:
    // every succeeded task's file is deleted, the manifest is untouched,
    // and the visible state is exactly the pre-job commit
    intercept[Exception] {
      src.write.format("graftsink").option("path", out)
        .option("failAtId", "50").mode("append").save()
    }
    assert(spark.read.format("graftsink").load(out)
      .orderBy("id").collect().toSeq == committed,
      "aborted job must not change the visible table state")
    // and the aborted attempt's data files are gone from disk
    val live = GraftSink.readManifest(out).get.files.toSet
    val onDisk = new java.io.File(out).listFiles()
      .map(_.getName).filter(_.endsWith(".gsink")).toSet
    assert(onDisk == live, s"orphan files after abort: ${onDisk -- live}")
  }

  test("graftsink manifest segments: appends stay O(commit), compaction folds them") {
    val out = java.nio.file.Files.createTempDirectory("gsink_seg").toString
    val src = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("id"), col("o_totalprice"))
      .where(col("id") <= 50)
    src.write.format("graftsink").option("path", out).mode("overwrite").save()
    (1 to 3).foreach { i =>
      src.withColumn("id", col("id") + i * 1000000L)
        .write.format("graftsink").option("path", out).mode("append").save()
    }
    val m = GraftSink.readManifest(out).get
    // one immutable segment per commit — an append never re-writes the
    // cumulative data-file list
    assert(m.gen == 4 && m.segments.size == 4, s"gen=${m.gen} segs=${m.segments}")
    val before = spark.read.format("graftsink").load(out)
      .orderBy("id").collect().toSeq
    GraftSink.compact(out)
    val m2 = GraftSink.readManifest(out).get
    assert(m2.segments.size == 1 && m2.gen == m.gen + 1)
    assert(m2.files.toSet == m.files.toSet,
      "compaction must reference exactly the same data files")
    assert(spark.read.format("graftsink").load(out)
      .orderBy("id").collect().toSeq == before,
      "reads must be identical before/after compaction")
    // superseded segment files are cleaned after the publish
    def segsOnDisk() = new java.io.File(out).listFiles()
      .map(_.getName).filter(_.startsWith("_graftsink_seg_")).toSet
    assert(segsOnDisk() == m2.segments.toSet)
    // truncate starts the segment list fresh and cleans the superseded one
    src.write.format("graftsink").option("path", out).mode("overwrite").save()
    val m3 = GraftSink.readManifest(out).get
    assert(m3.segments.size == 1 && segsOnDisk() == m3.segments.toSet)
  }

  test("graftsink manifest checksum: a corrupted manifest fails loudly") {
    val out = java.nio.file.Files.createTempDirectory("gsink_ck").toString
    val src = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("id"), col("o_totalprice"))
      .where(col("id") <= 20)
    src.write.format("graftsink").option("path", out).mode("overwrite").save()
    val mf = new java.io.File(out, GraftSink.ManifestName).toPath
    val lines = java.nio.file.Files.readAllLines(mf)
    // forge the generation without re-computing the checksum — the
    // reader must refuse to serve from a tampered/torn manifest
    lines.set(1, "gen=999")
    java.nio.file.Files.write(mf, String.join("\n", lines).getBytes("UTF-8"))
    intercept[IllegalArgumentException] { GraftSink.readManifest(out) }
  }

  test("graftsink DSv2 exactly-once visibility: orphan files are never read") {
    val out = java.nio.file.Files.createTempDirectory("gsink_orphan").toString
    val src = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("id"), col("o_totalprice"))
      .where(col("id") <= 100)
    src.write.format("graftsink").option("path", out).mode("overwrite").save()
    val n = spark.read.format("graftsink").load(out).count()
    // a zombie/speculative task's file lands in the directory AFTER the
    // commit — manifest-gated readers must not see a single row of it
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      GraftSink.readManifest(out).get.ddl)
    val orphan = new java.io.File(out, "part-9-999-zombie.gsink")
    java.nio.file.Files.write(orphan.toPath,
      "424242\t1.0".getBytes("UTF-8"))
    assert(schema.length == 2) // premise: the orphan line parses
    assert(spark.read.format("graftsink").load(out).count() == n,
      "an uncommitted file must be invisible")
    assert(!spark.read.format("graftsink").load(out)
      .where(col("id") === 424242L).collect().nonEmpty)
  }

  test("explicit bloom prefilter probes via the native codegen expression, not a udf") {
    // q_bloom_prefilter's probe must be Spark's BloomFilterMightContain
    // (whole-stage-codegen'd mightContainLong against the serialized
    // filter literal), not an interpreted Scala udf wrapping a
    // broadcast — pin the plan shape so a refactor can't silently
    // regress the probe out of codegen.
    val q = graft.analytics.Joins.queries("q_bloom_prefilter")(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.toLowerCase.contains("udf"), plan)
    assert(q.count() > 0)
  }

  test("S10: batched JDBC append sink round-trips (embedded Derby)") {
    // The reference's ETL appends each batch to Postgres over JDBC
    // (dags/ETL.py:131-140); the engine analog is df.write.jdbc in
    // append mode. Exercised against the Derby driver that ships with
    // Spark; skipped (not silently passed) when no driver is present.
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    assume(
      try { Class.forName(driver); true } catch { case _: Throwable => false },
      "no embedded JDBC driver on the classpath")
    val url = "jdbc:derby:memory:graftwh;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", driver)
    // deterministic subset (a LIMIT would be scan-order-dependent)
    val src = graft.Tables(spark, dir, "orders")
      .filter(col("o_orderkey") < 800)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    val nSrc = src.count()
    val sumSrc = src.agg(graft.util.Exact.moneySum(col("o_totalprice")))
      .head().getDouble(0)
    src.write.mode("append")
      .option("createTableColumnTypes", "o_orderpriority VARCHAR(20)")
      .jdbc(url, "ORDERS_SINK", props)
    src.write.mode("append").jdbc(url, "ORDERS_SINK", props) // batch 2
    val back = spark.read.jdbc(url, "ORDERS_SINK", props)
    assert(back.count() == 2 * nSrc)
    // every key appended exactly twice — append, not overwrite
    assert(back.groupBy("o_orderkey").count()
      .filter(col("count") =!= 2).count() == 0)
    val sumBack = back.agg(graft.util.Exact.moneySum(col("o_totalprice")))
      .head().getDouble(0)
    assert(sumBack == 2 * sumSrc)
  }

  test("binaryFile source ingests raw media files with path/length metadata") {
    // The multimodal ingest front door: raw image/audio files on disk
    // become (path, modificationTime, length, content) rows via the
    // binaryFile source — the step that feeds Multimodal's decode
    // pipeline. pathGlobFilter prunes non-media files at LISTING time
    // (never read), and a length predicate is answerable from file
    // status alone.
    val mediaDir = java.nio.file.Files.createTempDirectory("graft_media")
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(mediaDir.resolve(name), bytes)
    put("a.jpg", Array[Byte](-1, -40, -1, -32, 1, 2, 3)) // JPEG SOI header
    put("b.jpg", Array[Byte](-1, -40, -1, -32, 9, 8, 7, 6, 5))
    put("notes.txt", "not media".getBytes)
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.jpg")
      .load(mediaDir.toString)
    assert(df.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    assert(df.count() == 2) // the .txt never enters the scan
    val rows = df.select(col("path"), col("length"), col("content"))
      .collect().map(r => (r.getString(0).split('/').last,
        r.getLong(1), r.getAs[Array[Byte]](2)))
    val byName = rows.map(t => t._1 -> t).toMap
    assert(byName("a.jpg")._2 == 7L && byName("b.jpg")._2 == 9L)
    assert(byName("a.jpg")._3.take(2).sameElements(Array[Byte](-1, -40)))
    // metadata-only predicates don't require reading content
    assert(df.where(col("length") > 8).count() == 1)
  }

  test("DSv2 graftgen source: filter pushdown, column pruning, slicing") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = spark.read.format("graftgen") // short name via ServiceLoader
      .option("rows", 10000).option("slices", 8).load()
      .where(col("id") >= 2000 && col("id") < 8000 &&
        col("category") =!= "white")
      .select(col("id"), col("category"))
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }
    assert(scans.size == 1)
    val scan = scans.head.scan.asInstanceOf[GraftGenScan]
    // id range pushed INTO generation — the scan spans 6000 ids, and
    // splits them over the requested 8 partitions
    assert(scan.lo == 2000L && scan.hi == 8000L)
    assert(scan.planInputPartitions().length == 8)
    // amount/uniform_1k pruned out of the scan schema
    assert(scan.readSchema().fieldNames.toSet == Set("id", "category"))
    // the category residual is applied by Spark above the scan
    val rows = df.collect()
    assert(rows.length < 6000 && rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) >= 2000 && r.getLong(0) < 8000))
    assert(rows.forall(_.getString(1) != "white"))
    // pruning really skips work: an id-only projection never hashes
    val idOnly = spark.read.format("graftgen").option("rows", 100).load()
      .select(col("id"))
    val idScan = idOnly.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }.head.scan.asInstanceOf[GraftGenScan]
    assert(idScan.readSchema().fieldNames.sameElements(Array("id")))
    assert(idOnly.agg(sum(col("id"))).head().getLong(0) == 4950L)
  }

  test("DSv2 graftgen source: aggregate pushdown, partial-merge, fallback") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def agged() = spark.read.format("graftgen")
      .option("rows", 100000).option("slices", 8).load()
      .where(col("id") < 60000)
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"), min(col("uniform_1k")).as("min_u"),
        max(col("uniform_1k")).as("max_u"), sum(col("uniform_1k")).as("sum_u"))
    val scan = agged().queryExecution.sparkPlan.collect {
      case b: BatchScanExec => b }.head.scan
    // the group-by reached the reader: pre-aggregating scan, id range
    // still pushed, output is slices × groups partials (≤ 40 rows for
    // a 60k-id span), merged by Spark's final aggregate
    val aggScan = scan.asInstanceOf[GraftGenAggScan]
    assert(aggScan.description().contains("PushedAggregation"))
    assert(aggScan.lo == 0L && aggScan.hi == 60000L)
    assert(aggScan.readSchema().fieldNames.length == 5)
    val out = agged().orderBy(col("category")).collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(1)).sum == 60000L) // counts cover the span
    assert(out.forall(r => r.getLong(2) >= 0 && r.getLong(3) <= 999))
    // all-or-nothing contract: sum over a double column is not pushed,
    // the scan falls back to raw rows and Spark aggregates them itself
    val fb = spark.read.format("graftgen")
      .option("rows", 1000).load()
      .groupBy(col("category")).agg(sum(col("amount")).as("s"))
    val fbScan = fb.queryExecution.sparkPlan.collect {
      case b: BatchScanExec => b }.head.scan
    assert(fbScan.isInstanceOf[GraftGenScan])
  }

  test("DSv2 graftgen source: fractional literals fall through as residual") {
    // asLong guard: longValue() on 5.5 would TRUNCATE (id >= 5.5 → lo=5,
    // admitting id=5) and the filter would be reported fully pushed
    // while returning wrong rows. Spark's current filter translation
    // casts the long column instead, so this path is only reachable by
    // a future translation — pin the guard with direct builder calls.
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
    val b = new GraftGenScanBuilder(100L, 4)
    val frac = Array[org.apache.spark.sql.sources.Filter](
      GreaterThanOrEqual("id", new java.math.BigDecimal("5.5")),
      LessThan("id", java.lang.Double.valueOf(42.25)))
    val residual = b.pushFilters(frac)
    assert(residual.toSet == frac.toSet) // nothing pushed, all residual
    assert(b.pushedFilters().isEmpty)
    val scan = b.build().asInstanceOf[GraftGenScan]
    assert(scan.lo == 0L && scan.hi == 100L) // span untouched
    // integral-valued decimals/doubles ARE safe and must still push
    val b2 = new GraftGenScanBuilder(100L, 4)
    val intish = Array[org.apache.spark.sql.sources.Filter](
      GreaterThanOrEqual("id", new java.math.BigDecimal("10.00")),
      LessThan("id", java.lang.Double.valueOf(90.0)))
    assert(b2.pushFilters(intish).isEmpty)
    assert(b2.pushedFilters().length == 2)
    val scan2 = b2.build().asInstanceOf[GraftGenScan]
    assert(scan2.lo == 10L && scan2.hi == 90L)
  }

  test("DSv2 graftgen source: limit/top-N pushdown and reported statistics") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scanOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect {
        case b: BatchScanExec => b }.head.scan.asInstanceOf[GraftGenScan]
    val base = spark.read.format("graftgen").option("rows", 100000).load()
    // LIMIT truncates generation to 7 ids, not 100k-then-discard
    val lim = base.select(col("id"), col("category")).limit(7)
    assert(scanOf(lim).hi - scanOf(lim).lo == 7L)
    assert(lim.count() == 7)
    // ORDER BY id + LIMIT rides the generator's natural order
    val topn = base.select(col("id")).orderBy(col("id")).limit(9)
    assert(scanOf(topn).hi - scanOf(topn).lo == 9L)
    assert(topn.collect().map(_.getLong(0)).toSeq == (0L until 9L))
    // a non-id sort is declined — full span, Spark takes-ordered
    val other = base.orderBy(col("amount")).limit(3)
    assert(scanOf(other).hi - scanOf(other).lo == 100000L)
    assert(other.count() == 3)
    // reported stats: a small filtered span broadcasts with NO hint
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val dim = spark.read.format("graftgen").option("rows", 100000).load()
      .where(col("id") < 50)
      .select(col("id"), col("category"))
    val fact = graft.Tables(spark, dir, "lineitem")
    val joined = fact.join(dim, fact("l_suppkey") === dim("id"))
    val bhj = joined.queryExecution.sparkPlan.collect {
      case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, "50-row generator side not auto-broadcast:\n" +
      joined.queryExecution.sparkPlan.toString)
  }

  test("CBO: ANALYZE column stats drive broadcast selection, no hints") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    // At 100 TB nobody hand-places broadcast() hints per query — the
    // warehouse keeps table+column statistics and the cost-based
    // optimizer estimates the post-filter size of the build side.
    // A/B-proved here: the SAME selective-dim join under the SAME
    // (low) broadcast threshold plans SMJ on raw file-size estimates,
    // and BroadcastHashJoin once ANALYZE + CBO let FilterEstimation
    // shrink the dim below the threshold.
    spark.sql(s"CREATE TABLE IF NOT EXISTS orders_cbo USING parquet LOCATION '$dir/orders.parquet'")
    spark.sql(s"CREATE TABLE IF NOT EXISTS lineitem_cbo USING parquet LOCATION '$dir/lineitem.parquet'")
    def dim() = spark.table("orders_cbo")
      .filter(col("o_totalprice") > 450000)
      .select(col("o_orderkey"), col("o_orderpriority"))
    def plannedJoin(): org.apache.spark.sql.execution.SparkPlan =
      spark.table("lineitem_cbo")
        .join(dim(), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
        .queryExecution.executedPlan
    val restore = Seq("spark.sql.adaptive.enabled", "spark.sql.cbo.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false") // plan-time only
      spark.conf.set("spark.sql.cbo.enabled", "false")
      // Without stats the filter is a no-op to size estimation: the
      // dim's estimate stays width-scaled-file-size. Anchor the
      // threshold just under THAT, so only a stats-driven shrink can
      // cross it.
      val noStats = dim().queryExecution.optimizedPlan.stats.sizeInBytes
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (noStats / 2).toString)
      assert(plannedJoin().collect { case j: SortMergeJoinExec => j }.nonEmpty,
        "without stats the filtered dim should not look broadcastable")
      spark.sql("ANALYZE TABLE orders_cbo COMPUTE STATISTICS FOR ALL COLUMNS")
      spark.sql("ANALYZE TABLE lineitem_cbo COMPUTE STATISTICS")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val withStats = dim().queryExecution.optimizedPlan.stats
      assert(withStats.sizeInBytes < noStats / 2,
        s"FilterEstimation should shrink the dim: ${withStats.sizeInBytes} vs $noStats")
      assert(plannedJoin().collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        "with column stats + CBO the filtered dim should broadcast")
    } finally {
      restore.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.sql("DROP TABLE IF EXISTS orders_cbo")
      spark.sql("DROP TABLE IF EXISTS lineitem_cbo")
    }
  }
}
