package graft.engine

import graft.core.VaultName
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path}
import java.time.Duration

/**
 * HTTP vault-provider client (P8 upload / Q3 cache read), speaking the
 * reference's provider protocol shape
 * (`pkg/vaultsprovider/provider.go:124-214`):
 *
 *  - upload: `POST {base}/vaults/{vault}/events?timestamp=…&signature=…`
 *    with a `filename` header and streamed body;
 *  - retrieve: `GET {base}/events/{cid}` — 404 ⇒ not-in-cache (the
 *    caller's [[Retriever]] then falls back to the cold store);
 *  - control-plane timeout 10 s like the reference
 *    (`provider.go:28-30`); upload/download unbounded.
 *
 * Zero-egress builds exercise this against a localhost server (see
 * `HttpContentStoreSpec`); the CID is taken from the provider's JSON
 * response (`{"cid":"…"}`).
 *
 * `progress` mirrors the reference CLI's upload progress bar
 * (`cmd/vaults/commands.go:312-330`, `progressbar.DefaultBytes`): called
 * with (bytesSent, totalBytes) as the streamed body is consumed —
 * monotone, ending at (total, total). Rendering is the caller's business
 * (see `graft.cli.Vaults.progressBar`).
 */
final class HttpContentStore(baseUrl: String, timeout: Duration = Duration.ofSeconds(10),
                             progress: Option[(Long, Long) => Unit] = None)
    extends ContentStore {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(timeout).build()

  private val CidRe = """"cid"\s*:\s*"([^"]+)"""".r

  /** File body publisher that reports consumed bytes to `progress`. */
  private def bodyWithProgress(file: Path, report: (Long, Long) => Unit) = {
    val total = Files.size(file)
    HttpRequest.BodyPublishers.ofInputStream(() => {
      val in = Files.newInputStream(file)
      new java.io.FilterInputStream(in) {
        private var sent = 0L
        override def read(): Int = {
          val r = super.read()
          if (r >= 0) { sent += 1; report(sent, total) }
          r
        }
        override def read(b: Array[Byte], off: Int, len: Int): Int = {
          val r = super.read(b, off, len)
          if (r > 0) { sent += r; report(sent, total) }
          r
        }
      }
    })
  }

  override def put(vault: VaultName, file: Path, timestampSec: Long,
                   signature: Array[Byte]): String = {
    val sigHex = signature.map("%02x".format(_)).mkString
    val uri = URI.create(
      s"$baseUrl/vaults/$vault/events?timestamp=$timestampSec&signature=$sigHex")
    val body = progress match {
      case Some(report) => bodyWithProgress(file, report)
      case None => HttpRequest.BodyPublishers.ofFile(file)
    }
    val req = HttpRequest.newBuilder(uri)
      .header("filename", file.getFileName.toString)
      .POST(body)
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"upload failed: HTTP ${resp.statusCode()} ${resp.body()}")
    CidRe.findFirstMatchIn(resp.body()).map(_.group(1))
      .getOrElse(throw new RuntimeException(s"no cid in provider response: ${resp.body()}"))
  }

  /** 404 → None (ErrNotFoundInCache analog); other errors propagate. */
  override def get(cid: String): Option[Path] = {
    val req = HttpRequest.newBuilder(URI.create(s"$baseUrl/events/$cid")).GET().build()
    val tmp = Files.createTempFile("graft-retrieve", ".bin")
    val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(tmp))
    resp.statusCode() match {
      case 200 => Some(resp.body())
      case 404 => Files.deleteIfExists(tmp); None
      case c => Files.deleteIfExists(tmp); throw new RuntimeException(s"retrieve failed: HTTP $c")
    }
  }

  /** Q1/M1 control-plane calls (vault create / list) share the client. */
  def createVault(vault: VaultName, account: String, cacheDuration: Int): Boolean = {
    val body = s"account=$account&cache=$cacheDuration"
    val req = HttpRequest.newBuilder(URI.create(s"$baseUrl/vaults/$vault"))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .timeout(timeout)
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    client.send(req, HttpResponse.BodyHandlers.ofString()).statusCode() / 100 == 2
  }
}
