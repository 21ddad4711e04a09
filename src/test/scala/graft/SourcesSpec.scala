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

  /** Avro container files written with the CORE avro lib (the
    * spark-avro connector is not on this classpath — [[graft.sources
    * .AvroFiles]] reads the container format itself): two files,
    * nullable union, nested record, array, map, enum, and the
    * date/timestamp-micros/decimal logical types, one Spark partition
    * per file. */
  test("avro source round-trips a multi-file directory with logical types") {
    import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val spark = TestSpark.spark
    val dir = Files.createTempDirectory("graft-avro-").toString
    val sch: Schema = SchemaBuilder.record("doc").fields()
      .requiredLong("id")
      .optionalString("name")
      .name("born").`type`(LogicalTypes.date()
        .addToSchema(Schema.create(Schema.Type.INT))).noDefault()
      .name("at").`type`(LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))).noDefault()
      .name("price").`type`(LogicalTypes.decimal(10, 2)
        .addToSchema(Schema.create(Schema.Type.BYTES))).noDefault()
      .name("state").`type`().enumeration("state")
        .symbols("NEW", "DONE").noDefault()
      .name("tags").`type`().array().items().stringType().noDefault()
      .name("attrs").`type`().map().values().longType().noDefault()
      .name("pos").`type`().record("pos").fields()
        .requiredDouble("x").requiredDouble("y").endRecord().noDefault()
      .endRecord()
    def rec(id: Long, name: String, day: Int, us: Long, cents: Long,
        state: String, tags: Seq[String], attrs: Map[String, Long],
        x: Double, y: Double): GenericRecord = {
      val r = new GenericData.Record(sch)
      r.put("id", id); r.put("name", name); r.put("born", day)
      r.put("at", us)
      r.put("price", java.nio.ByteBuffer.wrap(
        java.math.BigInteger.valueOf(cents).toByteArray))
      r.put("state", new GenericData.EnumSymbol(
        sch.getField("state").schema(), state))
      r.put("tags", java.util.Arrays.asList(tags: _*))
      val m = new java.util.HashMap[String, Long]()
      attrs.foreach { case (k, v) => m.put(k, v) }
      r.put("attrs", m)
      val p = new GenericData.Record(sch.getField("pos").schema())
      p.put("x", x); p.put("y", y); r.put("pos", p)
      r
    }
    def write(file: String, recs: Seq[GenericRecord]): Unit = {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](sch))
      w.create(sch, new java.io.File(file))
      recs.foreach(w.append); w.close()
    }
    write(s"$dir/part-0.avro", Seq(
      rec(1L, "alpha", 19000, 1700000000123456L, 12345L, "NEW",
        Seq("a", "b"), Map("k" -> 7L), 1.5, 2.5),
      rec(2L, null, 19001, 1700000001000000L, -250L, "DONE",
        Seq(), Map(), 0.0, -1.0)))
    write(s"$dir/part-1.avro", Seq(
      rec(3L, "gamma", 19002, 1700000002000001L, 999999999L, "NEW",
        Seq("z"), Map("a" -> 1L, "b" -> 2L), 3.0, 4.0)))
    val got = graft.sources.AvroSource(dir).read(spark)
    assert(got.rdd.getNumPartitions == 2, "one Spark partition per file")
    val st = got.schema
    assert(st("name").nullable && !st("id").nullable)
    assert(st("born").dataType == org.apache.spark.sql.types.DateType)
    assert(st("at").dataType == org.apache.spark.sql.types.TimestampType)
    assert(st("price").dataType ==
      org.apache.spark.sql.types.DecimalType(10, 2))
    val byId = got.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId.keySet == Set(1L, 2L, 3L))
    assert(byId(2L).getAs[String]("name") == null)
    assert(byId(1L).getAs[java.sql.Date]("born").toLocalDate ==
      java.time.LocalDate.ofEpochDay(19000))
    assert(byId(1L).getAs[java.sql.Timestamp]("at").toInstant ==
      java.time.Instant.ofEpochSecond(1700000000L, 123456000L))
    assert(byId(1L).getAs[java.math.BigDecimal]("price")
      .compareTo(new java.math.BigDecimal("123.45")) == 0)
    assert(byId(2L).getAs[java.math.BigDecimal]("price")
      .compareTo(new java.math.BigDecimal("-2.50")) == 0)
    assert(byId(3L).getAs[scala.collection.Seq[String]]("tags").toSeq ==
      Seq("z"))
    assert(byId(3L).getAs[scala.collection.Map[String, Long]]("attrs")
      .toMap == Map("a" -> 1L, "b" -> 2L))
    assert(byId(1L).getAs[org.apache.spark.sql.Row]("pos")
      .getDouble(0) == 1.5)
    assert(byId(1L).getAs[String]("state") == "NEW")
    // SQL-side sanity: the frame is a normal DataFrame (filters, aggs)
    got.createOrReplaceTempView("avro_docs")
    assert(spark.sql(
      "SELECT count(*) FROM avro_docs WHERE state = 'NEW'")
      .head().getLong(0) == 2L)
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
