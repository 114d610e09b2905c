package graft.engine

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.core.VaultName
import java.net.InetSocketAddress
import java.nio.file.Files
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** HTTP provider protocol spec against an in-process localhost server
  * (no egress): POST upload with timestamp/signature params + filename
  * header, GET by cid, 404 → cache miss → Retriever cold fallback. */
class HttpContentStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val blobs = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  @volatile private var lastUploadQuery: String = ""
  @volatile private var lastFilenameHeader: String = ""

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        (ex.getRequestMethod, path) match {
          case ("POST", p) if p.startsWith("/vaults/") && p.endsWith("/events") =>
            val body = ex.getRequestBody.readAllBytes()
            lastUploadQuery = ex.getRequestURI.getQuery
            lastFilenameHeader = ex.getRequestHeaders.getFirst("filename")
            val cid = java.security.MessageDigest.getInstance("SHA-256")
              .digest(body).map("%02x".format(_)).mkString.take(16)
            blobs.put(cid, body)
            val resp = s"""{"cid":"$cid"}""".getBytes
            ex.sendResponseHeaders(200, resp.length); ex.getResponseBody.write(resp)
          case ("GET", p) if p.startsWith("/events/") =>
            Option(blobs.get(p.stripPrefix("/events/"))) match {
              case Some(b) => ex.sendResponseHeaders(200, b.length); ex.getResponseBody.write(b)
              case None => ex.sendResponseHeaders(404, -1)
            }
          case _ => ex.sendResponseHeaders(405, -1)
        }
        ex.close()
      }
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  test("upload POSTs signature/timestamp params + filename header, returns cid") {
    val store = new HttpContentStore(base)
    val f = Files.createTempFile("up", ".parquet")
    Files.write(f, "payload-bytes".getBytes)
    val cid = store.put(VaultName("ns", "t"), f, 1700000000L, Array[Byte](0xab.toByte, 0xcd.toByte))
    assert(cid.nonEmpty)
    assert(lastUploadQuery.contains("timestamp=1700000000"))
    assert(lastUploadQuery.contains("signature=abcd"))
    assert(lastFilenameHeader.endsWith(".parquet"))

    val got = store.get(cid)
    assert(got.isDefined)
    assert(new String(Files.readAllBytes(got.get)) == "payload-bytes")
  }

  test("upload progress: monotone byte reports ending at (total, total)") {
    val reports = scala.collection.mutable.Buffer.empty[(Long, Long)]
    val store = new HttpContentStore(base,
      progress = Some((sent, total) => reports.synchronized { reports += ((sent, total)) }))
    val f = Files.createTempFile("prog", ".parquet")
    Files.write(f, Array.fill[Byte](256 * 1024)(7)) // larger than one chunk
    val cid = store.put(VaultName("ns", "t"), f, 0L, Array.emptyByteArray)
    assert(cid.nonEmpty)
    val rs = reports.synchronized { reports.toList }
    assert(rs.nonEmpty)
    assert(rs.forall(_._2 == 256L * 1024), "total is the file size")
    assert(rs.map(_._1) == rs.map(_._1).sorted, "byte counts are monotone")
    assert(rs.last._1 == 256L * 1024, "final report is (total, total)")
    // the rendered bar writes one line per percent and a trailing newline
    val buf = new java.io.ByteArrayOutputStream()
    val bar = graft.cli.Vaults.progressBar(new java.io.PrintStream(buf), "Writing...")
    rs.foreach { case (s2, t2) => bar(s2, t2) }
    val rendered = buf.toString
    // exact rendered line: single % (no literal "%%" artifact)
    assert(rendered.contains(s"\rWriting... 100% (${256L * 1024}/${256L * 1024} bytes)"))
    assert(!rendered.contains("%%"))
    assert(rendered.endsWith(System.lineSeparator()))
  }

  test("404 → None; Retriever falls back to cold store (Q3)") {
    val hot = new HttpContentStore(base)
    assert(hot.get("not-there").isEmpty)

    val coldDir = Files.createTempDirectory("cold").toString
    val cold = new LocalContentStore(coldDir)
    val f = Files.createTempFile("cold", ".bin")
    Files.write(f, Array[Byte](9, 9, 9))
    val coldCid = cold.put(VaultName("ns", "t"), f, 0L, Array.emptyByteArray)

    val r = new Retriever(hot, Some(cold))
    val got = r.retrieve(coldCid) // miss in cache → found in cold store
    assert(got.isDefined && Files.readAllBytes(got.get).toSeq == Seq[Byte](9, 9, 9))
  }
}
