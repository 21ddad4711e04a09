package graft

import graft.sources.{CsvSource, JsonSource, OrcSource, ParquetSource}
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
}
