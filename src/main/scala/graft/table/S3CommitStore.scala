package graft.table

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

/** The one HTTP hop [[S3CommitStore]] makes, behind a seam: production
  * wires the JDK client ([[JdkS3Transport]]); tests wire an in-memory
  * bucket that honors `If-None-Match` ([[graft.table.CommitStore]]'s
  * contract matrix then exercises the REAL store logic — request
  * construction, SigV4 signing, status handling, list pagination —
  * without any network, which this sandbox does not have). Same
  * dependency-seam discipline as `JdbcSnapshotSource`'s connection
  * factory and `RunLedger`'s clock. */
trait S3Transport {
  /** Execute one request; returns (status, body). `headers` are
    * name→value pairs, already signed. */
  def send(method: String, uri: URI, headers: Seq[(String, String)],
      body: Array[Byte]): (Int, Array[Byte])
}

/** [[S3Transport]] over `java.net.http.HttpClient` — the zero-extra-
  * dependency production wiring (the AWS SDK is deliberately NOT a
  * dependency; the store speaks the documented REST surface directly). */
final class JdkS3Transport extends S3Transport {
  private val client = HttpClient.newHttpClient()

  override def send(method: String, uri: URI,
      headers: Seq[(String, String)], body: Array[Byte]): (Int, Array[Byte]) = {
    val b = HttpRequest.newBuilder(uri).method(method,
      if (body.isEmpty) HttpRequest.BodyPublishers.noBody()
      else HttpRequest.BodyPublishers.ofByteArray(body))
    // Host is set by the client itself; everything else passes through
    headers.filterNot(_._1.equalsIgnoreCase("host"))
      .foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    (resp.statusCode(), resp.body())
  }
}

/** [[CommitStore]] over the S3 REST API with CONDITIONAL PUT as the
  * commit CAS — the object-store deployment shape of [[SnapshotLog]]'s
  * metadata plane. S3 added `If-None-Match: *` on PUT (one winner per
  * key, atomically, server-side) in 2024; that single primitive is the
  * entire concurrency story, exactly as the trait doc promises:
  *
  *  - `putIfAbsent` — `PUT` with `If-None-Match: *`: HTTP 200 means
  *    THIS call created the object (CAS won); 412 Precondition Failed
  *    means the manifest already exists (CAS lost — the commit loop
  *    re-reads and retries at the next version); 409 means a concurrent
  *    conditional write on the SAME key was in flight — retried here,
  *    because the outcome is not yet decided (one of the racers will
  *    land 200, all others 412).
  *  - `get`/`exists` — plain GET/HEAD; 404 is None (a vacuumed or
  *    never-committed version).
  *  - `list` — ListObjectsV2 under the prefix, continuation-token
  *    pagination folded in (manifest counts are bounded by the vacuum
  *    horizon, but segments share the prefix and a correct list must
  *    not truncate at 1000 keys).
  *  - `delete` — plain DELETE (vacuum's horizon trim; idempotent, 404
  *    is success).
  *
  * Requests are SigV4-signed here (HMAC-SHA256 over the canonical
  * request — the published algorithm), with the payload hash carried in
  * `x-amz-content-sha256`; credentials come from a supplier seam so
  * rotation/instance-profile wiring stays outside. The transport is a
  * seam too — the store's protocol logic runs under the spec suite
  * against an in-memory bucket honoring the same conditional-put
  * semantics, so "compile-ready for S3" is actually "contract-verified,
  * network pending".
  *
  * Scale: one signed PUT per commit, one GET per snapshot read —
  * latency is object-store round-trips, unchanged from the FS store's
  * design point. Data files do NOT route through here (the scan reads
  * them via the `s3a://` Hadoop connector like any parquet path); this
  * store carries only the manifest plane, whose objects are KB-to-MB.
  */
final class S3CommitStore(bucket: String, prefix: String, region: String,
    credentials: () => (String, String), transport: S3Transport,
    endpoint: Option[String] = None) extends CommitStore {
  require(!prefix.startsWith("/"), "prefix must be bucket-relative")

  private val host =
    endpoint.map(e => URI.create(e).getAuthority)
      .getOrElse(s"$bucket.s3.$region.amazonaws.com")
  private val scheme =
    endpoint.map(e => URI.create(e).getScheme).getOrElse("https")
  private val basePath = endpoint match {
    // custom endpoints (MinIO-style) are path-addressed: /bucket/key
    case Some(_) => s"/$bucket/"
    case None    => "/"
  }
  private def keyOf(name: String) =
    if (prefix.isEmpty) name else s"${prefix.stripSuffix("/")}/$name"

  override def putIfAbsent(name: String, payload: Array[Byte]): Boolean = {
    var attempts = 0
    while (true) {
      val (status, body) = signed("PUT", keyOf(name), Map.empty, payload,
        extraHeaders = Seq("if-none-match" -> "*"))
      status match {
        case 200 => return true
        case 412 => return false
        case 409 if attempts < 8 => attempts += 1 // racer undecided; re-ask
        case other => throw new IllegalStateException(
          s"S3 PUT $name returned $other: ${new String(body, UTF_8).take(300)}")
      }
    }
    false // unreachable
  }

  override def get(name: String): Option[Array[Byte]] = {
    val (status, body) = signed("GET", keyOf(name), Map.empty, Array.empty)
    status match {
      case 200 => Some(body)
      case 404 => None
      case other => throw new IllegalStateException(
        s"S3 GET $name returned $other")
    }
  }

  override def exists(name: String): Boolean = {
    val (status, _) = signed("HEAD", keyOf(name), Map.empty, Array.empty)
    status match {
      case 200 => true
      case 404 => false
      case other => throw new IllegalStateException(
        s"S3 HEAD $name returned $other")
    }
  }

  override def list(): Seq[String] = {
    val pfx = if (prefix.isEmpty) "" else s"${prefix.stripSuffix("/")}/"
    var token: Option[String] = None
    val out = Seq.newBuilder[String]
    var more = true
    while (more) {
      val q = Map("list-type" -> "2", "prefix" -> pfx) ++
        token.map("continuation-token" -> _)
      val (status, body) = signed("GET", "", q, Array.empty)
      if (status != 200) throw new IllegalStateException(
        s"S3 LIST returned $status: ${new String(body, UTF_8).take(300)}")
      val xml = new String(body, UTF_8)
      out ++= S3CommitStore.tagValues(xml, "Key")
        .map(_.stripPrefix(pfx)).filterNot(_.contains("/"))
      token = S3CommitStore.tagValues(xml, "NextContinuationToken").headOption
      more = S3CommitStore.tagValues(xml, "IsTruncated").headOption
        .contains("true") && token.isDefined
    }
    out.result()
  }

  override def delete(name: String): Unit = {
    val (status, _) = signed("DELETE", keyOf(name), Map.empty, Array.empty)
    // 204 deleted, 404 already gone — both terminal for a vacuum trim
    if (status != 204 && status != 200 && status != 404)
      throw new IllegalStateException(s"S3 DELETE $name returned $status")
  }

  // ---- SigV4 (the shared [[SigV4]] signer, service "s3") -------------

  private def signed(method: String, key: String, query: Map[String, String],
      body: Array[Byte], extraHeaders: Seq[(String, String)] = Nil)
      : (Int, Array[Byte]) = {
    val (accessKey, secretKey) = credentials()
    val canonicalUri = basePath + SigV4.uriEncodePath(key)
    val canonicalQuery = query.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${SigV4.uriEncode(k)}=${SigV4.uriEncode(v)}" }
      .mkString("&")
    val headers = SigV4.signedHeaders(method, host, canonicalUri,
      canonicalQuery, "s3", region, accessKey, secretKey, body, extraHeaders)
    // canonicalUri/Query are already RFC-3986 encoded — build the URI
    // from the raw string (the multi-arg URI constructor would
    // re-encode '%' and break the signature)
    val full = URI.create(s"$scheme://$host$canonicalUri" +
      (if (canonicalQuery.isEmpty) "" else s"?$canonicalQuery"))
    transport.send(method, full, headers, body)
  }
}

object S3CommitStore {

  /** All text contents of `<tag>…</tag>` in `xml`, document order —
    * the two ListObjectsV2 fields this store reads; a full XML parser
    * would be dead weight for a flat, known response shape. */
  private[table] def tagValues(xml: String, tag: String): Seq[String] = {
    val open = s"<$tag>"
    val close = s"</$tag>"
    val out = Seq.newBuilder[String]
    var i = xml.indexOf(open)
    while (i >= 0) {
      val end = xml.indexOf(close, i + open.length)
      if (end < 0) return out.result()
      out += xml.substring(i + open.length, end)
      i = xml.indexOf(open, end + close.length)
    }
    out.result()
  }
}
