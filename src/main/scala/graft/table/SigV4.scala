package graft.table

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.Instant
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing — the published HMAC-SHA256
  * canonical-request algorithm, implemented once and shared by every
  * REST-speaking AWS seam ([[S3CommitStore]]; the DynamoDB run ledger
  * in `graft.ledger`). Deliberately SDK-free: the build has zero
  * egress, and the algorithm is a page of hashing, not a dependency.
  *
  * The signer is a pure function of its inputs (the clock is the one
  * ambient read), so the per-service stores stay thin: build the
  * canonical pieces, ask for the signed header set, hand it to the
  * [[S3Transport]] seam.
  */
private[graft] object SigV4 {
  private val AmzDateFmt = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")

  /** The full signed header list (including `authorization`) for one
    * request. `canonicalUri`/`canonicalQuery` must already be
    * RFC-3986-encoded ([[uriEncode]]/[[uriEncodePath]]);
    * `extraHeaders` are signed along (lower-case names). */
  def signedHeaders(method: String, host: String, canonicalUri: String,
      canonicalQuery: String, service: String, region: String,
      accessKey: String, secretKey: String, body: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil,
      now: Instant = Instant.now()): Seq[(String, String)] = {
    val amzDate = AmzDateFmt.format(now.atOffset(ZoneOffset.UTC))
    val dateStamp = amzDate.take(8)
    val payloadHash = hex(sha256(body))
    val signHeaders = (Seq(
      "host" -> host,
      "x-amz-content-sha256" -> payloadHash,
      "x-amz-date" -> amzDate) ++ extraHeaders).sortBy(_._1)
    val canonicalHeaders =
      signHeaders.map { case (k, v) => s"$k:${v.trim}\n" }.mkString
    val signedHeaderNames = signHeaders.map(_._1).mkString(";")
    val canonicalRequest = Seq(method, canonicalUri, canonicalQuery,
      canonicalHeaders, signedHeaderNames, payloadHash).mkString("\n")
    val credScope = s"$dateStamp/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, credScope,
      hex(sha256(canonicalRequest.getBytes(UTF_8)))).mkString("\n")
    val kSigning = hmac(hmac(hmac(hmac(
      s"AWS4$secretKey".getBytes(UTF_8), dateStamp), region), service),
      "aws4_request")
    val signature = hex(hmacRaw(kSigning, stringToSign.getBytes(UTF_8)))
    val auth = s"AWS4-HMAC-SHA256 Credential=$accessKey/$credScope, " +
      s"SignedHeaders=$signedHeaderNames, Signature=$signature"
    signHeaders ++ Seq("authorization" -> auth)
  }

  def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  def hmacRaw(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  def hmac(key: Array[Byte], data: String): Array[Byte] =
    hmacRaw(key, data.getBytes(UTF_8))

  def hex(b: Array[Byte]): String =
    b.map(x => f"$x%02x").mkString

  /** RFC 3986 encoding as SigV4 requires (space → %20, tilde bare). */
  def uriEncode(s: String): String =
    s.flatMap { c =>
      if (c.isLetterOrDigit && c < 128 || "-._~".contains(c)) c.toString
      else c.toString.getBytes(UTF_8).map(b => f"%%${b & 0xff}%02X").mkString
    }

  /** Path encoding: like [[uriEncode]] but '/' stays a separator. */
  def uriEncodePath(s: String): String =
    s.split("/", -1).map(uriEncode).mkString("/")

  /** The `__type` of an AWS JSON error body (the taxonomy the JSON-1.x
    * services — DynamoDB, Glue, Secrets Manager — report conditional
    * failures and already-exists races through); None on a non-JSON or
    * typeless body. S3 errors are XML and stay with the S3 store. */
  def errorType(body: Array[Byte]): Option[String] =
    scala.util.Try(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(body)).toOption
      .flatMap(n => Option(n.get("__type"))).map(_.asText())
}

/** (scheme, host) of one AWS JSON-service endpoint: the regional
  * default, or a custom endpoint (localstack-style) when given — the
  * one derivation every JSON seam shares. S3 keeps its own (its default
  * host is bucket-virtual-hosted and its custom endpoints are
  * path-addressed). */
private[graft] object AwsEndpoint {
  def apply(service: String, region: String,
      endpoint: Option[String]): (String, String) =
    (endpoint.map(e => java.net.URI.create(e).getScheme).getOrElse("https"),
      endpoint.map(e => java.net.URI.create(e).getAuthority)
        .getOrElse(s"$service.$region.amazonaws.com"))
}
