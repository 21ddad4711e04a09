package graft.ledger

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.table.{S3Transport, SigV4}
import org.apache.spark.sql.{Dataset, SparkSession}

import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8

/** [[RunLedger]] over the DynamoDB REST API — the control-plane store
  * the reference actually deploys (reference:
  * aws_genaric_datapipeline/aws_genaric_datapipeline_stack.py:26-30
  * declares the DynamoDB table; glue src/raw_layer_job.py:177-210 writes
  * the audit item; glue src/prepared_layer_job.py:141-174 scans it).
  * Same deployment discipline as [[graft.table.S3CommitStore]]: the
  * documented JSON wire protocol (`DynamoDB_20120810.*` targets,
  * `application/x-amz-json-1.0`), SigV4-signed by the shared
  * [[graft.table.SigV4]] signer, no SDK dependency, the HTTP hop behind
  * the [[graft.table.S3Transport]] seam so the full protocol logic —
  * item marshalling, conditional-put semantics, Scan pagination,
  * signature construction — runs under the spec suite against an
  * in-memory double, with only the physical network send untested
  * in-sandbox.
  *
  * Table shape: composite key `(partition_key S, sk S)` where `sk` is
  * `<state>#<seq>#<nanos>` — the ledger trait is an APPEND-ONLY event
  * log (a state transition is a NEW record for the same run;
  * [[RunLedger.pending]] derives the live state), so each append lands
  * as its own item instead of overwriting, guarded by
  * `attribute_not_exists(sk)` — the DynamoDB conditional write is the
  * same one-winner primitive as S3's `If-None-Match`, and a lost race
  * (astronomically unlikely with the nanos component) just re-draws the
  * sort key. The reference keys on `partition_key` alone and OVERWRITES
  * on promotion — part of why its promotion never sticks (SURVEY §2.1
  * defect); the composite key is the corrected, replayable layout.
  *
  * Scale: the ledger is control-plane — O(runs), not O(data). A Scan
  * per [[records]] call is the intended access pattern (the reference
  * scans too); pagination is folded in so a long history never
  * truncates at the 1 MB page boundary.
  */
final class DynamoRunLedger(table: String, region: String,
    credentials: () => (String, String), transport: S3Transport,
    endpoint: Option[String] = None) extends RunLedger {

  private val mapper = new ObjectMapper()
  private val (scheme, host) = graft.table.AwsEndpoint("dynamodb", region, endpoint)
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  override def append(r: RunRecord): Unit = {
    var attempts = 0
    while (attempts < 8) {
      val sk = s"${r.state}#${seq.incrementAndGet()}#${System.nanoTime()}"
      val root = mapper.createObjectNode()
      root.put("TableName", table)
      root.put("ConditionExpression", "attribute_not_exists(sk)")
      val item = root.putObject("Item")
      item.putObject("sk").put("S", sk)
      DynamoRunLedger.fieldsOf(r).foreach { case (k, v) =>
        item.putObject(k).put("S", v)
      }
      val (status, body) =
        call("DynamoDB_20120810.PutItem", mapper.writeValueAsBytes(root))
      if (status == 200) return
      val errType = SigV4.errorType(body)
      if (errType.exists(_.contains("ConditionalCheckFailedException")))
        attempts += 1
      else throw new IllegalStateException(
        s"DynamoDB PutItem on $table returned $status: " +
          new String(body, UTF_8).take(300))
    }
    throw new IllegalStateException(
      s"DynamoDB PutItem on $table lost 8 sort-key draws in a row — " +
        "a colliding writer is regenerating identical keys")
  }

  override def records(spark: SparkSession): Dataset[RunRecord] = {
    import spark.implicits._
    val out = Seq.newBuilder[RunRecord]
    var startKey: Option[JsonNode] = None
    var more = true
    while (more) {
      val root = mapper.createObjectNode()
      root.put("TableName", table)
      startKey.foreach(k => root.set[JsonNode]("ExclusiveStartKey", k))
      val (status, body) =
        call("DynamoDB_20120810.Scan", mapper.writeValueAsBytes(root))
      if (status != 200) throw new IllegalStateException(
        s"DynamoDB Scan on $table returned $status: " +
          new String(body, UTF_8).take(300))
      val resp = mapper.readTree(body)
      Option(resp.get("Items")).foreach { items =>
        (0 until items.size()).foreach { i =>
          out += DynamoRunLedger.recordOf(items.get(i))
        }
      }
      startKey = Option(resp.get("LastEvaluatedKey"))
      more = startKey.isDefined
    }
    val rs = out.result()
    if (rs.isEmpty) spark.emptyDataset[RunRecord] else rs.toDS()
  }

  /** One signed POST to the service endpoint: every DynamoDB operation
    * is `POST /` with the op in `x-amz-target` — both that header and
    * the JSON content type ride inside the signature. */
  private def call(target: String, body: Array[Byte]): (Int, Array[Byte]) = {
    val (accessKey, secretKey) = credentials()
    val headers = SigV4.signedHeaders("POST", host, "/", "", "dynamodb",
      region, accessKey, secretKey, body, extraHeaders = Seq(
        "content-type" -> "application/x-amz-json-1.0",
        "x-amz-target" -> target))
    transport.send("POST", URI.create(s"$scheme://$host/"), headers, body)
  }
}

object DynamoRunLedger {
  /** The 11 reference audit-item attributes, all `{"S": ...}` like the
    * reference writes them (glue src/raw_layer_job.py:196-204). */
  private def fieldsOf(r: RunRecord): Seq[(String, String)] = Seq(
    "partition_key" -> r.partition_key, "job_src" -> r.job_src,
    "state" -> r.state, "rawBucket" -> r.rawBucket,
    "rawFolder" -> r.rawFolder, "rawJobName" -> r.rawJobName,
    "rawEntryCount" -> r.rawEntryCount,
    "preparedBucket" -> r.preparedBucket,
    "preparedFolder" -> r.preparedFolder,
    "preparedJobName" -> r.preparedJobName,
    "preparedEntryCount" -> r.preparedEntryCount)

  private def recordOf(item: JsonNode): RunRecord = {
    def s(name: String): String =
      Option(item.get(name)).flatMap(n => Option(n.get("S")))
        .map(_.asText()).getOrElse("")
    RunRecord(s("partition_key"), s("job_src"), s("state"), s("rawBucket"),
      s("rawFolder"), s("rawJobName"), s("rawEntryCount"),
      s("preparedBucket"), s("preparedFolder"), s("preparedJobName"),
      s("preparedEntryCount"))
  }

}
