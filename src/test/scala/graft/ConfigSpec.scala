package graft

import graft.config.{ColumnSpec, PipelineConfig}
import org.apache.spark.sql.types.{LongType, StringType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Config parse/validate/render (SURVEY §5-2; reference shape:
  * pipelines/tableA/config.json). */
class ConfigSpec extends AnyFunSuite {

  private val refShaped =
    """{
      |  "template": "cds_view",
      |  "project": "proj",
      |  "subject": "subj",
      |  "config": {"job_src": "tableA", "dynamoTable": "pipeline_table"},
      |  "raw": {"rawBucket": "/tmp/raw", "rawS3Folder": "tableA", "CDSView": "table_a_view"},
      |  "prepared": {"preparedBucket": "/tmp/prepared"},
      |  "data_object": {
      |    "name": "table_a",
      |    "schema": [
      |      {"name": "id", "type": "bigint", "comment": "pk"},
      |      {"name": "name", "type": "string", "comment": ""},
      |      {"name": "ts", "type": "timestamp", "comment": "event time"}
      |    ]
      |  }
      |}""".stripMargin

  test("parses the reference config shape") {
    val c = PipelineConfig.parse(refShaped)
    assert(c.jobSrc == "tableA")
    assert(c.ledgerName == "pipeline_table")
    assert(c.rawRoot == "/tmp/raw" && c.rawFolder == "tableA")
    assert(c.preparedRoot == "/tmp/prepared" && c.tableName == "table_a")
    assert(c.displayName == "proj-subj-tableA")
    assert(c.rawRunPath("r1") == "/tmp/raw/tableA/ETL_PART_KEY=r1")
    assert(c.preparedPath == "/tmp/prepared/tableA")
  }

  test("declared Hive type strings become Spark types (DDL parse)") {
    val st = PipelineConfig.parse(refShaped).structType
    assert(st.fields.map(_.dataType).toSeq == Seq(LongType, StringType, TimestampType))
    assert(st("id").metadata.getString("comment") == "pk")
  }

  test("render → parse round-trips") {
    val c = PipelineConfig.parse(refShaped)
    assert(PipelineConfig.parse(PipelineConfig.render(c)) == c)
  }

  test("unknown template is rejected (reference dispatches only cds_view)") {
    val bad = refShaped.replace("\"cds_view\"", "\"not_a_template\"")
    assertThrows[IllegalArgumentException](PipelineConfig.parse(bad))
  }

  test("missing required field fails fast") {
    val bad = refShaped.replace("\"job_src\": \"tableA\", ", "")
    assertThrows[IllegalArgumentException](PipelineConfig.parse(bad))
  }

  test("loadAll walks a pipelines dir and skips non-pipeline entries") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg-")
    val p1 = dir.resolve("tableA"); java.nio.file.Files.createDirectories(p1)
    java.nio.file.Files.writeString(p1.resolve("config.json"), refShaped)
    java.nio.file.Files.createDirectories(dir.resolve("empty-dir"))
    val all = PipelineConfig.loadAll(dir)
    assert(all.map(_.jobSrc) == Seq("tableA"))
  }

  test("column spec with empty comment has no comment metadata") {
    assert(ColumnSpec("c", "string", "").toStructField.metadata.contains("comment") == false)
  }

  test("bloom_columns: parses, round-trips, validates against the schema") {
    val withBlooms = refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      "\"preparedBucket\": \"/tmp/prepared\", \"bloom_columns\": \"id\"")
    val c = PipelineConfig.parse(withBlooms)
    assert(c.bloomColumns == Seq("id"))
    assert(PipelineConfig.parse(PipelineConfig.render(c)) == c)
    // a column outside the declared schema fails fast
    assertThrows[IllegalArgumentException](PipelineConfig.parse(refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      "\"preparedBucket\": \"/tmp/prepared\", \"bloom_columns\": \"nope\"")))
  }

  test("partition_by / sort_by: parse, round-trip, validate; log format required") {
    val withPart = refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      "\"preparedBucket\": \"/tmp/prepared\", \"table_format\": \"log\", " +
        "\"partition_by\": \"day(ts), bucket[8](id), name\", \"sort_by\": \"id\"")
    val c = PipelineConfig.parse(withPart)
    assert(c.partitionBy == Seq(
      graft.table.PartitionField.day("ts"),
      graft.table.PartitionField.bucket("id", 8),
      graft.table.PartitionField.identity("name")))
    assert(c.sortBy == Seq("id"))
    assert(PipelineConfig.parse(PipelineConfig.render(c)) == c)
    // unknown source column / unknown transform fail fast at parse time
    assertThrows[IllegalArgumentException](PipelineConfig.parse(refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      "\"preparedBucket\": \"/tmp/prepared\", \"table_format\": \"log\", " +
        "\"partition_by\": \"day(nope)\"")))
    assertThrows[IllegalArgumentException](PipelineConfig.parse(refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      "\"preparedBucket\": \"/tmp/prepared\", \"table_format\": \"log\", " +
        "\"partition_by\": \"week(ts)\"")))
    // the bare-directory layer has no partition-tuple contract
    assertThrows[IllegalArgumentException](PipelineConfig.parse(refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      "\"preparedBucket\": \"/tmp/prepared\", \"partition_by\": \"day(ts)\"")))
  }

  test("change_feed: parses, round-trips, requires the log format") {
    val withCdc = refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      "\"preparedBucket\": \"/tmp/prepared\", \"table_format\": \"log\", " +
        "\"change_feed\": true")
    val c = PipelineConfig.parse(withCdc)
    assert(c.changeFeed && c.useLog)
    assert(PipelineConfig.parse(PipelineConfig.render(c)) == c)
    // CDC images live in the log's manifests — the bare directory can't
    assertThrows[IllegalArgumentException](PipelineConfig.parse(refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      "\"preparedBucket\": \"/tmp/prepared\", \"change_feed\": true")))
  }

  test("rollup: parses, round-trips, validates key/inputs, requires the log format") {
    val rollupJson = "\"rollup\": {\"name\": \"by_name\", \"key\": \"name\", " +
      "\"aggs\": [{\"out\": \"n_rows\", \"fn\": \"count\"}, " +
      "{\"out\": \"sum_id\", \"fn\": \"sum\", \"in\": \"id\"}]}"
    val withRollup = refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      s""""preparedBucket": "/tmp/prepared", "table_format": "log", $rollupJson""")
    val c = PipelineConfig.parse(withRollup)
    val r = c.rollup.get
    assert(r.name == "by_name" && r.key == "name")
    assert(r.aggs.map(a => (a.out, a.fn, a.in)) ==
      Seq(("n_rows", "count", ""), ("sum_id", "sum", "id")))
    assert(c.rollupPath("by_name") == "/tmp/prepared/tableA__rollup_by_name")
    assert(PipelineConfig.parse(PipelineConfig.render(c)) == c)
    // the rollup folds the log's change feed — the bare directory has none
    assertThrows[IllegalArgumentException](PipelineConfig.parse(refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      s""""preparedBucket": "/tmp/prepared", $rollupJson""")))
    // undeclared key / agg input columns fail fast
    assertThrows[IllegalArgumentException](PipelineConfig.parse(
      withRollup.replace("\"key\": \"name\"", "\"key\": \"nope\"")))
    assertThrows[IllegalArgumentException](PipelineConfig.parse(
      withRollup.replace("\"in\": \"id\"", "\"in\": \"nope\"")))
  }

  test("constraints: parse, round-trip, require the log format, refuse duplicates") {
    val chkJson =
      "\"constraints\": [{\"name\": \"qty_pos\", \"check\": \"id > 0\"}]"
    val withChk = refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      s""""preparedBucket": "/tmp/prepared", "table_format": "log", $chkJson""")
    val c = PipelineConfig.parse(withChk)
    assert(c.constraints == Seq(graft.config.CheckSpec("qty_pos", "id > 0")))
    assert(PipelineConfig.parse(PipelineConfig.render(c)) == c)
    // enforcement rides the log's staging — the bare directory has no
    // abort-before-publish point
    assertThrows[IllegalArgumentException](PipelineConfig.parse(refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      s""""preparedBucket": "/tmp/prepared", $chkJson""")))
    // duplicate names and empty expressions fail at config time
    assertThrows[IllegalArgumentException](PipelineConfig.parse(withChk.replace(
      "[{\"name\": \"qty_pos\", \"check\": \"id > 0\"}]",
      "[{\"name\": \"a\", \"check\": \"id > 0\"}, {\"name\": \"a\", \"check\": \"id < 9\"}]")))
    assertThrows[IllegalArgumentException](PipelineConfig.parse(
      withChk.replace("id > 0", " ")))
  }

  test("layout policy: parses cluster_by + layout_mode, round-trips, validates") {
    import graft.config.LayoutPolicy
    val withLayout = refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      "\"preparedBucket\": \"/tmp/prepared\", \"cluster_by\": \"id, ts\", \"layout_mode\": \"zorder\"")
    val c = PipelineConfig.parse(withLayout)
    assert(c.layout.contains(LayoutPolicy(Seq("id", "ts"), zorder = true)))
    assert(PipelineConfig.parse(PipelineConfig.render(c)) == c)
    // default mode is lexicographic
    val lex = PipelineConfig.parse(refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      "\"preparedBucket\": \"/tmp/prepared\", \"cluster_by\": \"id\""))
    assert(lex.layout.contains(LayoutPolicy(Seq("id"), zorder = false)))
    assert(PipelineConfig.parse(PipelineConfig.render(lex)) == lex)
    // a column outside the declared schema fails fast (typo protection:
    // the policy runs unattended at maintenance time, much later)
    assertThrows[IllegalArgumentException](PipelineConfig.parse(refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      "\"preparedBucket\": \"/tmp/prepared\", \"cluster_by\": \"nope\"")))
    // zorder needs >= 2 columns; unknown mode is rejected
    assertThrows[IllegalArgumentException](PipelineConfig.parse(refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      "\"preparedBucket\": \"/tmp/prepared\", \"cluster_by\": \"id\", \"layout_mode\": \"zorder\"")))
    assertThrows[IllegalArgumentException](PipelineConfig.parse(refShaped.replace(
      "\"preparedBucket\": \"/tmp/prepared\"",
      "\"preparedBucket\": \"/tmp/prepared\", \"cluster_by\": \"id\", \"layout_mode\": \"hilbert\"")))
  }
}
