package graft

import graft.ledger.{DynamoRunLedger, RunRecord, RunState}
import graft.table.{JdkS3Transport, S3CommitStore, SnapshotLog}
import org.scalatest.funsuite.AnyFunSuite

/** OPT-IN live-endpoint smoke: the only hop the in-sandbox suites
  * cannot exercise is the physical network send — everything else
  * (SigV4 shape, wire protocol, pagination, CAS semantics) is
  * contract-verified against protocol doubles in
  * S3CommitStore/DynamoLedger/GlueCatalog specs. When a network and an
  * endpoint exist (real AWS, MinIO, DynamoDB Local, moto), these tests
  * drive the SAME production classes over [[JdkS3Transport]] end to
  * end; without the env vars they cancel (`assume`), never fail.
  *
  * Enable with:
  * {{{
  * SPARK_GRAFT_LIVE_S3_ENDPOINT=http://localhost:9000 \
  * SPARK_GRAFT_LIVE_S3_BUCKET=graft-test \
  * SPARK_GRAFT_LIVE_DYNAMO_ENDPOINT=http://localhost:8000 \
  * SPARK_GRAFT_LIVE_DYNAMO_TABLE=graft-ledger \
  * AWS_ACCESS_KEY_ID=... AWS_SECRET_ACCESS_KEY=... \
  * SPARK_GRAFT_LIVE_REGION=us-east-1 sbt "testOnly graft.LiveEndpointSpec"
  * }}}
  */
class LiveEndpointSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def env(k: String): Option[String] = sys.env.get(k).filter(_.nonEmpty)
  private def region = env("SPARK_GRAFT_LIVE_REGION").getOrElse("us-east-1")
  private def creds: () => (String, String) = () => (
    env("AWS_ACCESS_KEY_ID").getOrElse("test"),
    env("AWS_SECRET_ACCESS_KEY").getOrElse("test"))

  test("S3 commit store: conditional-put CAS + full table protocol over the wire") {
    assume(env("SPARK_GRAFT_LIVE_S3_ENDPOINT").isDefined &&
      env("SPARK_GRAFT_LIVE_S3_BUCKET").isDefined,
      "set SPARK_GRAFT_LIVE_S3_ENDPOINT + SPARK_GRAFT_LIVE_S3_BUCKET to enable")
    val prefix = s"live-smoke-${java.util.UUID.randomUUID().toString.take(8)}"
    val store = new S3CommitStore(env("SPARK_GRAFT_LIVE_S3_BUCKET").get,
      prefix, region, creds, new JdkS3Transport,
      endpoint = env("SPARK_GRAFT_LIVE_S3_ENDPOINT"))
    val payload = """{"v":1}""".getBytes("UTF-8")
    // the one guarantee everything rests on: first create wins, second loses
    assert(store.putIfAbsent("v1.json", payload))
    assert(!store.putIfAbsent("v1.json", """{"v":"loser"}""".getBytes("UTF-8")),
      "If-None-Match must refuse the second writer ON THE REAL ENDPOINT")
    assert(store.get("v1.json").map(new String(_, "UTF-8")).contains("""{"v":1}"""))
    assert(store.list().contains("v1.json"))
    store.delete("v1.json")
    assert(store.get("v1.json").isEmpty && !store.exists("v1.json"))
    // the table format end-to-end over the remote manifest plane: local
    // parquet data, S3-committed manifests, CAS-raced appends
    val dir = java.nio.file.Files.createTempDirectory("graft-live-s3-")
      .resolve("t").toString
    val log = SnapshotLog(spark, dir, Nil, store)
    import spark.implicits._
    log.append(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    log.append(Seq((3, "c")).toDF("id", "v"))
    assert(log.currentVersion() == 2 && log.read().count() == 3)
    assert(log.read(1).count() == 2, "time travel through remote manifests")
    (1L to 2L).foreach(v => store.delete(f"v$v%020d.json"))
  }

  test("DynamoDB run ledger: append, pending scan, exactly-once promote over the wire") {
    assume(env("SPARK_GRAFT_LIVE_DYNAMO_ENDPOINT").isDefined &&
      env("SPARK_GRAFT_LIVE_DYNAMO_TABLE").isDefined,
      "set SPARK_GRAFT_LIVE_DYNAMO_ENDPOINT + SPARK_GRAFT_LIVE_DYNAMO_TABLE to enable")
    val ledger = new DynamoRunLedger(env("SPARK_GRAFT_LIVE_DYNAMO_TABLE").get,
      region, creds, new JdkS3Transport,
      endpoint = env("SPARK_GRAFT_LIVE_DYNAMO_ENDPOINT"))
    val runId = s"live-${System.currentTimeMillis()}"
    ledger.append(RunRecord(runId, "smoke.py", RunState.RawCompleted,
      "bucket", "folder", "job", "42"))
    val pend = ledger.pending(spark, "smoke.py")
    assert(pend.exists(_.partition_key == runId),
      "the appended run must come back pending from a real Scan")
    ledger.append(RunRecord(runId, "smoke.py", RunState.PreparedCompleted,
      "bucket", "folder", "job", "42", "pb", "pf", "pj", "42"))
    assert(!ledger.pending(spark, "smoke.py").exists(_.partition_key == runId),
      "the terminal state must drain the run from pending")
  }

  test("Glue catalog: register + idempotent re-register over the wire") {
    assume(env("SPARK_GRAFT_LIVE_GLUE_ENDPOINT").isDefined,
      "set SPARK_GRAFT_LIVE_GLUE_ENDPOINT to enable")
    val glue = new graft.catalog.GlueCatalog(region, creds,
      new JdkS3Transport, endpoint = env("SPARK_GRAFT_LIVE_GLUE_ENDPOINT"))
    val cfg = graft.config.PipelineConfig(
      template = graft.config.PipelineConfig.CdsViewTemplate,
      project = "graft", subject = "live", jobSrc = "live_smoke",
      ledgerName = "pipeline_ledger",
      rawRoot = "s3://lake/raw", rawFolder = "live_smoke",
      cdsView = "live_smoke",
      preparedRoot = "s3://lake/prepared", tableName = "live_smoke",
      schema = Seq(graft.config.ColumnSpec("id", "bigint", "row id")))
    val name = glue.register(cfg)
    assert(name.nonEmpty)
    assert(glue.register(cfg) == name,
      "re-registration must drain into UpdateTable, not fail")
  }
}
