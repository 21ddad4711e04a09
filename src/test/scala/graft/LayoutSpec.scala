package graft

import graft.jobs.LayoutJob
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Layout (sort-clustering) contract, proven from the parquet footers
  * themselves: before clustering every file's [min, max] on the key
  * spans ~the full value range (append-order layout — min/max stats can
  * skip nothing); after `LayoutJob.clusterBy` the per-file ranges are
  * pairwise DISJOINT, so a range predicate reads only intersecting
  * files. Data identity and the verified swap ride the same protocol as
  * CompactionSpec. */
class LayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Append-order layer: key k is pseudo-random (deterministic), so all
    * four part files cover ~the whole [0, 10000) range. */
  private def appendOrderLayer(): String = {
    val dir = Files.createTempDirectory("graft-layout-").resolve("layer").toString
    (0 until 4000)
      .map(i => (((i * 2654435761L) % 10000).toInt, s"payload-$i"))
      .toDF("k", "payload")
      .repartition(4)
      .write.option("compression", "snappy").parquet(dir)
    dir
  }

  /** Per-file [min, max] of a string column, from the footers' binary
    * stats — the ordering string predicates skip on. */
  private def fileRangesStr(dir: String, column: String): Seq[(String, String)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.toString), conf))
        try {
          val stats = r.getFooter.getBlocks.asScala.toSeq.map(
            _.getColumns.asScala.find(_.getPath.toDotString == column).get.getStatistics)
          (stats.map(_.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
            .toStringUsingUTF8).min,
            stats.map(_.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
              .toStringUsingUTF8).max)
        } finally r.close()
      }
  }

  /** Per-file [min, max] of an int column, straight from the footers. */
  private def fileRanges(dir: String, column: String = "k"): Seq[(Int, Int)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.toString), conf))
        try {
          val stats = r.getFooter.getBlocks.asScala.toSeq.map(
            _.getColumns.asScala.find(_.getPath.toDotString == column).get.getStatistics)
          (stats.map(_.genericGetMin.asInstanceOf[Number].intValue).min,
            stats.map(_.genericGetMax.asInstanceOf[Number].intValue).max)
        } finally r.close()
      }
  }

  test("clusterBy rewrites overlapping file ranges into disjoint ones, rows intact") {
    val dir = appendOrderLayer()
    val expected = spark.read.parquet(dir).as[(Int, String)].collect().sorted.toSeq
    val beforeRanges = fileRanges(dir)
    assert(beforeRanges.size == 4)
    // append-order layout: every file spans (almost) the full key range,
    // so every pair of files overlaps — min/max stats can skip nothing
    assert(beforeRanges.forall { case (lo, hi) => hi - lo > 5000 },
      s"fixture files must span the range, got $beforeRanges")

    val bytes = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.length).sum
    val m = LayoutJob.clusterBy(spark, dir, Seq("k"), targetFileBytes = bytes / 4 + 1)
    assert(m.rows == 4000 && m.filesBefore == 4)
    assert(m.filesAfter >= 2, s"need multiple files to show disjointness: $m")

    // after: ranges pairwise disjoint — sort by min, each file starts
    // past the previous file's max (range partitioning keeps equal keys
    // in one partition, so strict disjointness holds)
    val after = fileRanges(dir).sortBy(_._1)
    after.sliding(2).foreach {
      case Seq((_, hiPrev), (loNext, _)) =>
        assert(loNext > hiPrev, s"file ranges overlap after clustering: $after")
      case _ => ()
    }
    // identical data, swap left no residue
    assert(spark.read.parquet(dir).as[(Int, String)].collect().sorted.toSeq == expected)
    val siblings = new java.io.File(dir).getParentFile.list().toSeq
    assert(siblings == Seq("layer"), s"swap left residue: $siblings")
  }

  test("a range predicate's matching files shrink from all to one after clustering") {
    val dir = appendOrderLayer()
    def matchingFiles(lo: Int, hi: Int): Int =
      fileRanges(dir).count { case (fLo, fHi) => fHi >= lo && fLo <= hi }
    // the skipping arithmetic the parquet reader applies, computed from
    // the same footer stats it uses: before clustering a narrow range
    // predicate intersects EVERY file; after, exactly the files whose
    // range contains it (here 1 of 4)
    assert(matchingFiles(4000, 4500) == 4, "append-order layout must match all files")
    LayoutJob.clusterBy(spark, dir, Seq("k"),
      targetFileBytes = new java.io.File(dir).listFiles()
        .filter(_.isFile).map(_.length).sum / 4 + 1)
    assert(matchingFiles(4000, 4500) <= 2,
      s"clustered layout must confine a narrow range to few files: ${fileRanges(dir)}")
  }

  test("the engine actually skips: scan-decoded rows collapse after clustering") {
    // The two tests above prove the footer arithmetic; this one proves
    // the ENGINE applies it. Parquet pushdown skips row groups (and
    // pages) whose [min,max] misses the predicate, and the scan node's
    // numOutputRows metric counts rows the reader DECODED — so on the
    // append-order layout a narrow range predicate still decodes ~every
    // row (each row group spans the full range), while on the clustered
    // layout only the intersecting files'/row-groups' rows decode.
    import org.apache.spark.sql.functions.col
    def decodedRows(dir: String): (Long, Long) = {
      val q = spark.read.parquet(dir).filter(col("k").between(4000, 4500))
      // materialize q itself: count() would plan (and meter) a different
      // query, leaving q's own scan metrics untouched
      val result = q.collect().length.toLong
      val scan = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head
      (scan.metrics("numOutputRows").value, result)
    }
    val dir = appendOrderLayer()
    val (decodedBefore, hitsBefore) = decodedRows(dir)
    assert(decodedBefore == 4000,
      s"append-order layout must decode every row, got $decodedBefore")
    LayoutJob.clusterBy(spark, dir, Seq("k"),
      targetFileBytes = layerBytes(dir) / 4 + 1)
    val (decodedAfter, hitsAfter) = decodedRows(dir)
    assert(hitsAfter == hitsBefore, "clustering must not change results")
    assert(decodedAfter <= 4000 / 2,
      s"clustered layout must skip at the reader: decoded $decodedAfter of 4000")
  }

  test("LayoutAdvisor: observed predicates rank cluster columns and pick the layout") {
    import graft.config.LayoutPolicy
    import graft.orchestrate.LayoutAdvisor
    import org.apache.spark.sql.functions.col
    val dir = appendOrderLayer2D()
    val df = spark.read.parquet(dir)
    val schema = df.schema
    val advisor = new LayoutAdvisor
    def observe(q: org.apache.spark.sql.DataFrame): Unit =
      advisor.record(q.queryExecution.executedPlan)

    // a BETWEEN (two comparisons on one column) is ONE vote
    observe(df.filter(col("x").between(10, 20)))
    assert(advisor.predicateCounts.collect { case ((_, "x"), n) => n }.sum == 1)

    // workload dominated by x ⇒ lexicographic on x alone (a distant
    // second column isn't worth halving x's skipping power for)
    observe(df.filter(col("x") > 100))
    observe(df.filter(col("x") === 5))
    observe(df.filter(col("y") < 50))
    val root = advisor.predicateCounts.keys.head._1
    assert(advisor.advise(root, schema).contains(LayoutPolicy(Seq("x"))))

    // y catches up to within 2x ⇒ z-order both range-typed columns
    observe(df.filter(col("y") <= 7))
    assert(advisor.advise(root, schema)
      .contains(LayoutPolicy(Seq("x", "y"), zorder = true)))

    // string columns are z-order candidates too (zorderBy ranks them
    // via the binary-ordered sample; parquet keeps binary min/max)
    val advisor2 = new LayoutAdvisor
    advisor2.record(df.filter(col("payload") === "payload-7").queryExecution.executedPlan)
    assert(advisor2.advise(root, schema).contains(LayoutPolicy(Seq("payload"))))
    advisor2.record(df.filter(col("x") > 3).queryExecution.executedPlan)
    assert(advisor2.advise(root, schema)
      .contains(LayoutPolicy(Seq("payload", "x"), zorder = true)))

    // unknown path ⇒ no advice
    assert(advisor.advise("/no/such/table", schema).isEmpty)

    // the listener path end-to-end: install on the session, run an
    // action, poll for the async bus delivery
    val advisor3 = new LayoutAdvisor().install(spark)
    try {
      df.filter(col("x").between(1, 2)).collect()
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (advisor3.predicateCounts.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(advisor3.predicateCounts.exists { case ((_, c), _) => c == "x" },
        s"listener never saw the scan: ${advisor3.predicateCounts}")
    } finally spark.listenerManager.unregister(advisor3)
  }

  test("adviseBlooms: equality probes nominate blooms; advised log maintenance adopts them") {
    import graft.config.{ColumnSpec, LayoutPolicy, PipelineConfig}
    import graft.jobs.RawLayerJob
    import graft.ledger.LocalJsonLedger
    import graft.orchestrate.{LayoutAdvisor, Orchestrator}
    import graft.sources.ParquetSource
    import graft.table.PreparedTable
    import org.apache.spark.sql.functions.col

    // nomination rules: range workload picks the layout leader; the
    // equality/IN-probed columns OFF the layout become bloom nominees
    val dir = appendOrderLayer2D()
    val df = spark.read.parquet(dir)
    val schema = df.schema
    val advisor = new LayoutAdvisor
    def observe(q: org.apache.spark.sql.DataFrame): Unit =
      advisor.record(q.queryExecution.executedPlan)
    observe(df.filter(col("x").between(10, 20)))
    observe(df.filter(col("x") > 100))
    observe(df.filter(col("x") < 7))
    observe(df.filter(col("x") >= 9000))
    observe(df.filter(col("payload") === "payload-7"))
    observe(df.filter(col("payload").isin("a", "b", "c")))
    observe(df.filter(col("y") === 5))
    val root = advisor.predicateCounts.keys.head._1
    assert(advisor.advise(root, schema).contains(LayoutPolicy(Seq("x"))))
    assert(advisor.adviseBlooms(root, schema) == Seq("payload", "y"),
      "equality-probed columns off the layout, ranked by probe count")
    // a layout column never doubles as a bloom (range stats serve it)
    observe(df.filter(col("x") === 5))
    assert(!advisor.adviseBlooms(root, schema).contains("x"))
    assert(advisor.adviseBlooms("/no/such/table", schema).isEmpty)

    // e2e: a log-backed advised pipeline whose workload mixes a range
    // column with a point-lookup column — maintenance clusters on the
    // range leader, records its manifest stats, AND blooms the lookup
    // column, all in the one rewrite
    val tmp = Files.createTempDirectory("graft-advisedbloom-")
    val cfg = PipelineConfig(
      template = PipelineConfig.CdsViewTemplate,
      project = "graft", subject = "test",
      jobSrc = "lineitem", ledgerName = "pipeline_ledger",
      rawRoot = s"$tmp/raw", rawFolder = "lineitem", cdsView = "lineitem",
      preparedRoot = s"$tmp/prepared",
      tableName = s"ab_${tmp.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")}",
      schema = Seq(
        ColumnSpec("l_orderkey", "bigint", ""), ColumnSpec("l_partkey", "bigint", ""),
        ColumnSpec("l_suppkey", "bigint", ""), ColumnSpec("l_linenumber", "int", ""),
        ColumnSpec("l_quantity", "double", ""), ColumnSpec("l_extendedprice", "double", ""),
        ColumnSpec("l_discount", "double", ""), ColumnSpec("l_tax", "double", ""),
        ColumnSpec("l_returnflag", "string", ""), ColumnSpec("l_linestatus", "string", ""),
        ColumnSpec("l_shipdate", "timestamp", "")),
      layoutAdvised = true, tableFormat = PipelineConfig.FormatLog)
    val src = ParquetSource(s"${TestSpark.Sf0001}/lineitem.parquet")
    val ledger = new LocalJsonLedger(tmp.resolve("ledger"))
    (1 to 3).foreach(i => RawLayerJob.run(spark, cfg, src, ledger, s"run$i"))
    Orchestrator.drain(spark, cfg, ledger) // promote (default threshold)
    val adv2 = new LayoutAdvisor
    val prepared = PreparedTable.read(spark, cfg)
    (1 to 5).foreach(i => adv2.record(prepared
      .filter(col("l_partkey") > i * 50L).queryExecution.executedPlan))
    (1 to 2).foreach(i => adv2.record(prepared
      .filter(col("l_orderkey") === i * 7L).queryExecution.executedPlan))
    val m = Orchestrator.maybeCompact(spark, cfg, maxFiles = 2, advisor = Some(adv2))
    assert(m.nonEmpty, "maintenance must fire past the file threshold")
    val snap = PreparedTable.log(spark, cfg).snapshot()
    assert(snap.op == "cluster", s"advised range leader must cluster: ${snap.op}")
    assert(snap.stats.nonEmpty && snap.stats.values.forall(_.contains("l_partkey")),
      "the advised cluster column must get manifest stats in the same pass")
    assert(snap.blooms.nonEmpty &&
      snap.blooms.values.forall(_.contains("l_orderkey")),
      "the advised bloom column must be indexed in the same pass")
    // and the blooms work through a PLAIN log handle (probing reads the
    // manifest, not the constructor's bloomColumns)
    val hits = PreparedTable.log(spark, cfg).readKeys("l_orderkey", Seq(7L))
    assert(hits.count() ==
      prepared.filter(col("l_orderkey") === 7L).count())
  }

  test("advised layout mode: maintenance adopts the advisor's policy; declared always wins") {
    import graft.config.{ColumnSpec, PipelineConfig}
    import graft.jobs.{LayoutMetrics, RawLayerJob}
    import graft.ledger.LocalJsonLedger
    import graft.orchestrate.{LayoutAdvisor, Orchestrator}
    import graft.sources.ParquetSource
    import org.apache.spark.sql.functions.col

    def pipeline(tmp: java.nio.file.Path,
        layout: Option[graft.config.LayoutPolicy], advised: Boolean) = PipelineConfig(
      template = PipelineConfig.CdsViewTemplate,
      project = "graft", subject = "test",
      jobSrc = "lineitem", ledgerName = "pipeline_ledger",
      rawRoot = s"$tmp/raw", rawFolder = "lineitem", cdsView = "lineitem",
      preparedRoot = s"$tmp/prepared",
      tableName = s"a_${tmp.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")}",
      schema = Seq(
        ColumnSpec("l_orderkey", "bigint", ""), ColumnSpec("l_partkey", "bigint", ""),
        ColumnSpec("l_suppkey", "bigint", ""), ColumnSpec("l_linenumber", "int", ""),
        ColumnSpec("l_quantity", "double", ""), ColumnSpec("l_extendedprice", "double", ""),
        ColumnSpec("l_discount", "double", ""), ColumnSpec("l_tax", "double", ""),
        ColumnSpec("l_returnflag", "string", ""), ColumnSpec("l_linestatus", "string", ""),
        ColumnSpec("l_shipdate", "timestamp", "")),
      layout = layout, layoutAdvised = advised)
    val src = ParquetSource(s"${TestSpark.Sf0001}/lineitem.parquet")

    // no declared policy, advised mode: the skewed workload's hot
    // predicate column becomes the adopted clustering
    val tmp1 = Files.createTempDirectory("graft-advised-")
    val cfg1 = pipeline(tmp1, None, advised = true)
    val ledger1 = new LocalJsonLedger(tmp1.resolve("ledger"))
    (1 to 3).foreach(i => RawLayerJob.run(spark, cfg1, src, ledger1, s"run$i"))
    Orchestrator.drain(spark, cfg1, ledger1) // promote only (default threshold)
    val advisor = new LayoutAdvisor
    val prepared = spark.read.parquet(cfg1.preparedPath)
    (1 to 3).foreach(i => advisor.record(
      prepared.filter(col("l_orderkey") > i * 100L).queryExecution.executedPlan))
    val m1 = Orchestrator.maybeCompact(spark, cfg1, maxFiles = 2, advisor = Some(advisor))
    assert(m1.keySet == Set(cfg1.preparedPath))
    assert(m1.values.head.asInstanceOf[LayoutMetrics].clusterBy == Seq("l_orderkey"),
      "maintenance must adopt the advisor's recommendation")
    // and the rewrite genuinely clustered: per-file key ranges disjoint
    val ranges = fileRanges(cfg1.preparedPath, "l_orderkey")
    ranges.sorted.sliding(2).filter(_.size == 2).foreach { w =>
      assert(w(0)._2 <= w(1)._1, s"overlapping ranges after advised clustering: $ranges")
    }

    // declared policy present: the SAME advice is ignored
    val tmp2 = Files.createTempDirectory("graft-declared-")
    val cfg2 = pipeline(tmp2,
      Some(graft.config.LayoutPolicy(Seq("l_partkey"))), advised = false)
    val ledger2 = new LocalJsonLedger(tmp2.resolve("ledger"))
    (1 to 3).foreach(i => RawLayerJob.run(spark, cfg2, src, ledger2, s"run$i"))
    Orchestrator.drain(spark, cfg2, ledger2)
    val m2 = Orchestrator.maybeCompact(spark, cfg2, maxFiles = 2, advisor = Some(advisor))
    assert(m2.values.head.asInstanceOf[LayoutMetrics].clusterBy == Seq("l_partkey"),
      "a declared policy must always win over advice")

    // advised mode with NO advice yet: plain bin-pack, never blocked
    val tmp3 = Files.createTempDirectory("graft-noadvice-")
    val cfg3 = pipeline(tmp3, None, advised = true)
    val ledger3 = new LocalJsonLedger(tmp3.resolve("ledger"))
    (1 to 3).foreach(i => RawLayerJob.run(spark, cfg3, src, ledger3, s"run$i"))
    Orchestrator.drain(spark, cfg3, ledger3)
    val m3 = Orchestrator.maybeCompact(spark, cfg3, maxFiles = 2,
      advisor = Some(new LayoutAdvisor))
    assert(m3.nonEmpty && !m3.values.head.isInstanceOf[LayoutMetrics],
      "no advice yet must fall back to plain compaction")
  }

  // ---- Z-order (multi-column) clustering -------------------------------

  /** Append-order layer with TWO INDEPENDENT uniform keys (seeded RNG —
    * two linear-in-i formulas would be perfectly correlated mod the
    * domain, putting all points on a lattice line): every file spans
    * ~the full range of both x and y. */
  private def appendOrderLayer2D(): String = {
    val dir = Files.createTempDirectory("graft-zorder-").resolve("layer").toString
    val rnd = new scala.util.Random(42)
    (0 until 4000)
      .map(i => (rnd.nextInt(10000), rnd.nextInt(10000), s"payload-$i"))
      .toDF("x", "y", "payload")
      .repartition(4)
      .write.option("compression", "snappy").parquet(dir)
    dir
  }

  private def layerBytes(dir: String): Long =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.length).sum

  private def span(r: (Int, Int)): Int = r._2 - r._1

  test("rank_bucket and interleave_bits: codegen and interpreted agree with a pure-Scala reference") {
    import graft.functions.{InterleaveBits, RankBucket, ZOrderFunctions}
    import org.apache.spark.sql.functions.col
    val boundaries = Array(10.0, 20.0, 20.0, 55.5, 90.0) // duplicate on purpose
    def refBucket(v: Double): Int = boundaries.count(_ <= v)
    def refInterleave(vals: Seq[Int], bits: Int): Long = {
      var z = 0L
      for (c <- vals.indices; i <- 0 until bits)
        z |= ((vals(c).toLong >>> i) & 1L) << (i * vals.size + c)
      z
    }
    val samples = Seq(-5.0, 10.0, 19.99, 20.0, 55.5, 89.9, 90.0, 1e9)
    // codegen path: through a DataFrame projection
    val viaDf = samples.toDF("v")
      .select(ZOrderFunctions.rank_bucket(col("v"), boundaries).as("b"))
      .as[Int].collect().toSeq
    assert(viaDf == samples.map(refBucket), "rank_bucket codegen disagrees with reference")
    // interpreted path: direct eval
    val viaEval = samples.map(v => RankBucket(
      org.apache.spark.sql.catalyst.expressions.Literal(v), boundaries)
      .eval(null).asInstanceOf[Int])
    assert(viaEval == samples.map(refBucket), "rank_bucket eval disagrees with reference")

    val pairs = Seq((0, 0), (1, 0), (0, 1), (3, 5), (4095, 4095), (7, 4090))
    val zDf = pairs.toDF("a", "b")
      .select(ZOrderFunctions.interleave_bits(
        Seq(col("a"), col("b")), bitsPerCol = 12).as("z"))
      .as[Long].collect().toSeq
    assert(zDf == pairs.map(p => refInterleave(Seq(p._1, p._2), 12)),
      "interleave_bits codegen disagrees with reference")
    val zEval = pairs.map(p => InterleaveBits(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal(p._1),
      org.apache.spark.sql.catalyst.expressions.Literal(p._2)), 12)
      .eval(null).asInstanceOf[Long])
    assert(zEval == pairs.map(p => refInterleave(Seq(p._1, p._2), 12)),
      "interleave_bits eval disagrees with reference")
    // out-of-range buckets clamp instead of corrupting neighbors' bits
    assert(InterleaveBits(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal(99999),
      org.apache.spark.sql.catalyst.expressions.Literal(0)), 12)
      .eval(null) == refInterleave(Seq(4095, 0), 12))
  }

  test("zorderBy bounds EVERY dimension per file where lexicographic sort bounds only the first") {
    // lexicographic contrast: clusterBy(x, y) makes x disjoint but leaves
    // y spanning ~the full range inside every file — y predicates skip nothing
    val lexDir = appendOrderLayer2D()
    val expected = spark.read.parquet(lexDir).as[(Int, Int, String)].collect().sorted.toSeq
    LayoutJob.clusterBy(spark, lexDir, Seq("x", "y"),
      targetFileBytes = layerBytes(lexDir) / 4 + 1)
    val lexY = fileRanges(lexDir, "y")
    assert(lexY.size >= 2 && lexY.forall(span(_) > 8000),
      s"lexicographic layout should leave y un-narrowed, got $lexY")

    // z-order: every file is bounded in BOTH x and y (a contiguous z-range
    // is a bounded region of the plane). Quadrant alignment is exact by
    // construction: the exchange partitions on the key's top-bits cell
    // id, so cuts land only at cell boundaries.
    val zDir = appendOrderLayer2D()
    val m = LayoutJob.zorderBy(spark, zDir, Seq("x", "y"),
      targetFileBytes = layerBytes(zDir) / 4 + 1)
    assert(m.rows == 4000 && m.filesBefore == 4)
    val (zx, zy) = (fileRanges(zDir, "x"), fileRanges(zDir, "y"))
    assert(zx.size >= 4, s"need >=4 files for quadrant geometry: $zx")
    assert(zx.forall(span(_) <= 7000) && zy.forall(span(_) <= 7000),
      s"z-order must bound both dimensions per file, got x=$zx y=$zy")

    // the skipping arithmetic: a narrow predicate on EITHER column alone
    // now intersects a strict subset of files (was: all of them). The
    // band sits away from the quadrant midpoint (~5000) so it lies in
    // one half of that dimension.
    def matching(rs: Seq[(Int, Int)], lo: Int, hi: Int): Int =
      rs.count { case (fLo, fHi) => fHi >= lo && fLo <= hi }
    assert(matching(zx, 2000, 2400) < zx.size, s"x predicate must skip files: $zx")
    assert(matching(zy, 2000, 2400) < zy.size, s"y predicate must skip files: $zy")

    // identical data, no swap residue
    assert(spark.read.parquet(zDir).as[(Int, Int, String)].collect().sorted.toSeq == expected)
    val siblings = new java.io.File(zDir).getParentFile.list().toSeq
    assert(siblings == Seq("layer"), s"swap left residue: $siblings")
  }

  test("string rank_bucket: codegen and interpreted agree with a pure-Scala reference") {
    import graft.functions.{StringRankBucket, ZOrderFunctions}
    import org.apache.spark.sql.functions.col
    val boundaries = Array("b", "dd", "dd", "m", "x") // duplicate on purpose
    def ref(v: String): Int = boundaries.count(_ <= v)
    val samples = Seq("", "a", "b", "bb", "dd", "m", "mz", "x", "zz", "é")
    val viaDf = samples.toDF("v")
      .select(ZOrderFunctions.rank_bucket_str(col("v"), boundaries).as("b"))
      .as[Int].collect().toSeq
    assert(viaDf == samples.map(ref), "string rank_bucket codegen disagrees with reference")
    val viaEval = samples.map(v => StringRankBucket(
      org.apache.spark.sql.catalyst.expressions.Literal(v), boundaries)
      .eval(null).asInstanceOf[Int])
    assert(viaEval == samples.map(ref), "string rank_bucket eval disagrees with reference")
    // null stays null (zorderBy coalesces to the curve origin upstream)
    assert(StringRankBucket(org.apache.spark.sql.catalyst.expressions.Literal(
      null, org.apache.spark.sql.types.StringType), boundaries).eval(null) == null)
  }

  test("zorderBy bounds a STRING dimension per file under the stats' binary order") {
    val dir = Files.createTempDirectory("graft-zstr-").resolve("layer").toString
    val rnd = new scala.util.Random(7)
    // zero-padded suffix: lexicographic (binary) order == numeric order
    // of the suffix, so span arithmetic on the parsed suffix is honest
    (0 until 4000)
      .map(i => (rnd.nextInt(10000), f"dom-${rnd.nextInt(10000)}%04d", s"p-$i"))
      .toDF("x", "s", "payload")
      .repartition(4)
      .write.option("compression", "snappy").parquet(dir)
    val expected = spark.read.parquet(dir).as[(Int, String, String)].collect().sorted.toSeq

    val m = LayoutJob.zorderBy(spark, dir, Seq("x", "s"),
      targetFileBytes = layerBytes(dir) / 4 + 1)
    assert(m.rows == 4000 && m.filesBefore == 4)

    val zx = fileRanges(dir, "x")
    val zs = fileRangesStr(dir, "s").map { case (lo, hi) =>
      (lo.stripPrefix("dom-").toInt, hi.stripPrefix("dom-").toInt) }
    assert(zx.size >= 4, s"need >=4 files for quadrant geometry: $zx")
    assert(zx.forall(span(_) <= 7000) && zs.forall(span(_) <= 7000),
      s"z-order must bound numeric AND string dims per file, got x=$zx s=$zs")
    // a narrow predicate on the STRING column alone skips files
    def matching(rs: Seq[(Int, Int)], lo: Int, hi: Int): Int =
      rs.count { case (fLo, fHi) => fHi >= lo && fLo <= hi }
    assert(matching(zs, 2000, 2400) < zs.size, s"string predicate must skip files: $zs")
    assert(matching(zx, 2000, 2400) < zx.size, s"x predicate must skip files: $zx")

    assert(spark.read.parquet(dir).as[(Int, String, String)].collect().sorted.toSeq == expected)
  }
}
