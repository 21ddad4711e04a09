package graft

import graft.sources.SecretsManagerCredentials
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

/** [[SecretsManagerCredentials]] over an in-memory Secrets Manager
  * double: request shape, signature scope, RDS-JSON secret parsing,
  * per-resolve rotation pickup, error surfacing. */
class SecretsSpec extends AnyFunSuite {

  private final class FakeSecrets extends graft.table.S3Transport {
    @volatile var secretString =
      """{"username":"app_user","password":"pw-1"}"""
    val sigOk = new java.util.concurrent.atomic.AtomicBoolean(true)
    @volatile var lastSecretId = ""

    override def send(method: String, uri: java.net.URI,
        headers: Seq[(String, String)], body: Array[Byte]): (Int, Array[Byte]) = {
      val hs = headers.map { case (k, v) => k.toLowerCase -> v }.toMap
      val sha = java.security.MessageDigest.getInstance("SHA-256").digest(body)
        .map(b => f"$b%02x").mkString
      if (!hs.getOrElse("authorization", "").contains("/secretsmanager/aws4_request") ||
        !hs.get("x-amz-content-sha256").contains(sha) ||
        !hs.get("x-amz-target").contains("secretsmanager.GetSecretValue"))
        sigOk.set(false)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      lastSecretId = mapper.readTree(body).get("SecretId").asText()
      val resp = mapper.createObjectNode()
      resp.put("Name", lastSecretId).put("SecretString", secretString)
      (200, mapper.writeValueAsBytes(resp))
    }
  }

  test("resolve parses the RDS JSON secret; rotation is picked up per resolve") {
    val fake = new FakeSecrets
    val creds = new SecretsManagerCredentials("prod/jdbc/sales", "us-east-1",
      () => ("AKIDEXAMPLE", "secret"), fake)
    assert(creds.resolve() == ("app_user", "pw-1"))
    assert(fake.lastSecretId == "prod/jdbc/sales")
    fake.secretString = """{"username":"app_user","password":"pw-2"}"""
    assert(creds.resolve() == ("app_user", "pw-2"),
      "resolution at read time must see the rotated secret, no redeploy")
    assert(fake.sigOk.get())
  }

  test("a service error surfaces with the secret id") {
    val broken = new graft.table.S3Transport {
      override def send(method: String, uri: java.net.URI,
          headers: Seq[(String, String)], body: Array[Byte]): (Int, Array[Byte]) =
        (400, """{"__type":"ResourceNotFoundException"}""".getBytes(UTF_8))
    }
    val creds = new SecretsManagerCredentials("missing", "us-east-1",
      () => ("AKIDEXAMPLE", "secret"), broken)
    val ex = intercept[IllegalStateException] { creds.resolve() }
    assert(ex.getMessage.contains("missing"))
  }
}
