package graft

import graft.sources.{CsvSource, JdbcSnapshotSource, JsonSource, OrcSource, ParquetSource}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Format coverage beyond the reference's parquet+JDBC (SURVEY §2.2
  * "file formats"): each SourceReader round-trips the same rows. */
class SourcesSpec extends AnyFunSuite {

  private lazy val base = {
    val spark = TestSpark.spark
    val tmp = Files.createTempDirectory("graft-sources-").toString
    val df = spark.read.parquet(s"${TestSpark.Sf0001}/nation.parquet")
    df.coalesce(1).write.option("header", "true").csv(s"$tmp/nation_csv")
    df.coalesce(1).write.json(s"$tmp/nation_json")
    df.coalesce(1).write.orc(s"$tmp/nation_orc")
    (tmp, df)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.select(col("n_nationkey").cast("long"), col("n_name"), col("n_regionkey").cast("long"))
      .collect().map(_.toSeq).toSet

  test("parquet source reads the fixture") {
    val expect = rows(base._2)
    assert(rows(ParquetSource(s"${TestSpark.Sf0001}/nation.parquet").read(TestSpark.spark)) == expect)
    assert(expect.size == 25)
  }

  test("csv source with declared schema round-trips") {
    val (tmp, df) = base
    val got = CsvSource(s"$tmp/nation_csv", schema = Some(df.schema)).read(TestSpark.spark)
    assert(rows(got) == rows(df))
  }

  test("json source with declared schema round-trips") {
    val (tmp, df) = base
    val got = JsonSource(s"$tmp/nation_json", schema = Some(df.schema)).read(TestSpark.spark)
    assert(rows(got) == rows(df))
  }

  test("orc source round-trips") {
    val (tmp, df) = base
    assert(rows(OrcSource(s"$tmp/nation_orc").read(TestSpark.spark)) == rows(df))
  }

  /** SURVEY §2.1 op #1: the JDBC snapshot source, exercised for real
    * against embedded Derby (ships in /opt/spark/jars — zero new deps):
    * total-pushdown subquery read plus the range-partitioned parallel
    * read the reference leaves on the table. */
  test("jdbc snapshot source round-trips through embedded Derby incl. partitioned read") {
    val spark = TestSpark.spark
    val db = Files.createTempDirectory("graft-derby-").resolve("db")
    val url = s"jdbc:derby:$db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA TESTDB")
      st.execute("CREATE TABLE TESTDB.CDS_ACCOUNTS (ID BIGINT NOT NULL, NAME VARCHAR(32), AMT DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO TESTDB.CDS_ACCOUNTS VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setLong(1, i.toLong); ps.setString(2, s"acct_$i"); ps.setDouble(3, i * 1.5)
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()

    val src = JdbcSnapshotSource(url = url,
      driver = "org.apache.derby.jdbc.EmbeddedDriver",
      dbSchema = "TESTDB", view = "CDS_ACCOUNTS",
      credentials = graft.sources.StaticCredentials("", ""))
    val df = src.read(spark)
    assert(df.count() == 100)
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("id", "name", "amt"))
    assert(df.filter(col("ID") === 7L).select("NAME").collect().map(_.getString(0)).toSeq == Seq("acct_7"))

    // partitioned read: the snapshot splits into range-parallel partitions
    val part = src.copy(partitionColumn = Some("ID"), numPartitions = 4,
      lowerBound = Some(1L), upperBound = Some(101L))
    val pdf = part.read(spark)
    assert(pdf.rdd.getNumPartitions == 4, "partitionColumn must split the read")
    assert(pdf.agg(org.apache.spark.sql.functions.sum("ID")).collect()(0).getLong(0) == 5050L)
  }

  test("binaryFile source: on-disk media files round-trip through a real decode") {
    // the production media path: opaque files on storage → Spark's
    // binaryFile source (path/length/content columns, predicate pushdown
    // on file metadata) → per-partition decode. The fixture media table
    // is synthesized in-memory elsewhere; this pins the on-disk leg.
    val spark = TestSpark.spark
    import graft.ops.Multimodal.ImageCodec
    val dir = java.nio.file.Files.createTempDirectory("graft-media-")
    val ids = Seq(0L, 2L, 4L, 6L)
    ids.foreach { id =>
      val w = (16 + id % 32).toInt; val h = (16 + id % 27).toInt
      java.nio.file.Files.write(
        dir.resolve(f"img_$id%04d.png"), ImageCodec.encodePng(w, h, id))
    }
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .load(dir.toString)
    assert(df.count() == ids.size)
    // decode dims from the content column and check the planted formulas
    import spark.implicits._
    val dims = df.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val id = path.split("img_").last.stripSuffix(".png").toLong
        val (w, h) = ImageCodec.decodeDims(bytes)
        (id, w, h)
      }
      .collect().toSeq.sortBy(_._1)
    dims.foreach { case (id, w, h) =>
      assert(w == (16 + id % 32).toInt && h == (16 + id % 27).toInt,
        s"decoded dims drifted for id=$id: ${w}x$h")
    }
    // metadata-only pruning: length filter answered without decoding
    assert(df.filter(col("length") > 0).count() == ids.size)
  }
}
