package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import graft.table.{S3Transport, SigV4}

import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8

/** [[CredentialsProvider]] over the AWS Secrets Manager REST API — the
  * lookup the reference stubbed out and replaced with inline literals
  * (reference: glue src/raw_layer_job.py:104-119, a commented-out
  * `get_secret_value` above hardcoded credentials). Same deployment
  * discipline as the other AWS seams ([[graft.table.S3CommitStore]],
  * [[graft.ledger.DynamoRunLedger]], [[graft.catalog.GlueCatalog]]):
  * the documented JSON wire protocol (`secretsmanager.GetSecretValue`,
  * `application/x-amz-json-1.1`), the shared [[graft.table.SigV4]]
  * signer, no SDK, the HTTP hop behind the [[graft.table.S3Transport]]
  * seam.
  *
  * The secret's `SecretString` is the standard RDS JSON shape —
  * `{"username": ..., "password": ...}` — resolved at READ time per the
  * [[CredentialsProvider]] contract, so rotation needs no redeploy: the
  * next run's `resolve()` fetches the current version (`AWSCURRENT` by
  * default, which is what GetSecretValue returns with no stage pinned).
  */
final class SecretsManagerCredentials(secretId: String, region: String,
    awsCredentials: () => (String, String), transport: S3Transport,
    endpoint: Option[String] = None) extends CredentialsProvider {

  private val mapper = new ObjectMapper()
  private val (scheme, host) =
    graft.table.AwsEndpoint("secretsmanager", region, endpoint)

  override def resolve(): (String, String) = {
    val req = mapper.createObjectNode()
    req.put("SecretId", secretId)
    val body = mapper.writeValueAsBytes(req)
    val (accessKey, secretKey) = awsCredentials()
    val headers = SigV4.signedHeaders("POST", host, "/", "",
      "secretsmanager", region, accessKey, secretKey, body,
      extraHeaders = Seq(
        "content-type" -> "application/x-amz-json-1.1",
        "x-amz-target" -> "secretsmanager.GetSecretValue"))
    val (status, resp) = transport.send("POST",
      URI.create(s"$scheme://$host/"), headers, body)
    if (status != 200) throw new IllegalStateException(
      s"Secrets Manager GetSecretValue $secretId returned $status: " +
        new String(resp, UTF_8).take(300))
    val secret = mapper.readTree(resp).get("SecretString")
    require(secret != null,
      s"secret $secretId has no SecretString (binary secrets are not " +
        "JDBC credentials)")
    val parsed = mapper.readTree(secret.asText())
    def field(n: String): String =
      Option(parsed.get(n)).map(_.asText()).getOrElse("")
    (field("username"), field("password"))
  }
}
