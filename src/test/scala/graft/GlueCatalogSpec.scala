package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.catalog.{CatalogRegistrar, GlueCatalog}
import graft.config.{ColumnSpec, PipelineConfig}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

/** [[GlueCatalog]] protocol over an in-memory Glue double: the config →
  * TableInput mapping, idempotent re-registration (CreateTable →
  * AlreadyExists → UpdateTable), database bootstrap, and the SigV4
  * signature shape — only the network send is faked, same discipline as
  * the S3/DynamoDB doubles. */
class GlueCatalogSpec extends AnyFunSuite {

  private final class FakeGlue extends graft.table.S3Transport {
    private val mapper = new ObjectMapper()
    val databases = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    val tables = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val sigOk = new java.util.concurrent.atomic.AtomicBoolean(true)
    @volatile var updates = 0

    override def send(method: String, uri: java.net.URI,
        headers: Seq[(String, String)], body: Array[Byte]): (Int, Array[Byte]) = {
      val hs = headers.map { case (k, v) => k.toLowerCase -> v }.toMap
      val sha = java.security.MessageDigest.getInstance("SHA-256").digest(body)
        .map(b => f"$b%02x").mkString
      if (!hs.getOrElse("authorization", "").contains("/glue/aws4_request") ||
        !hs.get("x-amz-content-sha256").contains(sha) ||
        !hs.get("content-type").contains("application/x-amz-json-1.1"))
        sigOk.set(false)
      val req = mapper.readTree(body)
      def err(t: String) = (400, s"""{"__type":"$t"}""".getBytes(UTF_8))
      hs.getOrElse("x-amz-target", "") match {
        case "AWSGlue.CreateDatabase" =>
          val name = req.get("DatabaseInput").get("Name").asText()
          if (databases.putIfAbsent(name, true) != null)
            err("com.amazonaws.glue#AlreadyExistsException")
          else (200, "{}".getBytes(UTF_8))
        case "AWSGlue.CreateTable" =>
          val name = req.get("TableInput").get("Name").asText()
          if (!databases.containsKey(req.get("DatabaseName").asText()))
            err("com.amazonaws.glue#EntityNotFoundException")
          else if (tables.containsKey(name))
            err("com.amazonaws.glue#AlreadyExistsException")
          else {
            tables.put(name, mapper.writeValueAsString(req.get("TableInput")))
            (200, "{}".getBytes(UTF_8))
          }
        case "AWSGlue.UpdateTable" =>
          val name = req.get("TableInput").get("Name").asText()
          if (!tables.containsKey(name)) err("com.amazonaws.glue#EntityNotFoundException")
          else {
            updates += 1
            tables.put(name, mapper.writeValueAsString(req.get("TableInput")))
            (200, "{}".getBytes(UTF_8))
          }
        case "AWSGlue.GetTable" =>
          Option(tables.get(req.get("Name").asText())) match {
            case None => err("com.amazonaws.glue#EntityNotFoundException")
            case Some(t) =>
              (200, s"""{"Table":$t}""".getBytes(UTF_8))
          }
        case other => err(s"UnknownOperationException:$other")
      }
    }
  }

  private def cfg(name: String = "sales") = PipelineConfig(
    template = PipelineConfig.CdsViewTemplate,
    project = "graft", subject = "test",
    jobSrc = name, ledgerName = "pipeline_ledger",
    rawRoot = "s3://lake/raw", rawFolder = name, cdsView = name,
    preparedRoot = "s3://lake/prepared", tableName = name,
    schema = Seq(ColumnSpec("id", "bigint", "row id"),
      ColumnSpec("amount", "double", "sale amount")))

  test("register maps the config onto a Glue external parquet table") {
    val fake = new FakeGlue
    val glue = new GlueCatalog("us-east-1",
      () => ("AKIDEXAMPLE", "secret"), fake)
    val fqn = glue.register(cfg())
    assert(fqn == s"${CatalogRegistrar.Database}.sales")
    val t = glue.getTable("sales")
    assert(t.get("TableType").asText() == "EXTERNAL_TABLE")
    val sd = t.get("StorageDescriptor")
    assert(sd.get("Location").asText() == "s3://lake/prepared/sales")
    assert(sd.get("SerdeInfo").get("SerializationLibrary").asText()
      .contains("ParquetHiveSerDe"))
    val cols = sd.get("Columns")
    val names = (0 until cols.size()).map(cols.get(_).get("Name").asText())
    assert(names == Seq("id", "amount", "ETL_PART_KEY"),
      "declared columns plus the audit column, in order")
    assert(cols.get(0).get("Type").asText() == "bigint")
    assert(fake.sigOk.get(), "every request must be correctly SigV4-signed")
  }

  test("re-registration is idempotent: CreateTable drains into UpdateTable") {
    val fake = new FakeGlue
    val glue = new GlueCatalog("us-east-1",
      () => ("AKIDEXAMPLE", "secret"), fake)
    glue.register(cfg())
    val changed = cfg().copy(schema = Seq(
      ColumnSpec("id", "bigint", "row id"),
      ColumnSpec("amount", "double", "sale amount"),
      ColumnSpec("region", "string", "sale region")))
    glue.register(changed) // second run: AlreadyExists → UpdateTable
    assert(fake.updates == 1)
    val cols = glue.getTable("sales").get("StorageDescriptor").get("Columns")
    assert(cols.size() == 4, "the update must carry the widened schema")
    // the database bootstrap tolerated its own AlreadyExists on run 2
    assert(fake.databases.size == 1)
  }

  test("a non-AlreadyExists error surfaces instead of being swallowed") {
    val fake = new FakeGlue // no database pre-created, CreateDatabase broken:
    val broken = new graft.table.S3Transport {
      override def send(method: String, uri: java.net.URI,
          headers: Seq[(String, String)], body: Array[Byte]): (Int, Array[Byte]) =
        (400, """{"__type":"AccessDeniedException"}""".getBytes(UTF_8))
    }
    val glue = new GlueCatalog("us-east-1",
      () => ("AKIDEXAMPLE", "secret"), broken)
    val ex = intercept[IllegalStateException] { glue.register(cfg()) }
    assert(ex.getMessage.contains("CreateDatabase"))
    val _ = fake // keep the well-formed double for symmetry
  }
}
