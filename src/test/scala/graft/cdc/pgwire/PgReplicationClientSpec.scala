package graft.cdc.pgwire

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import PgWire._

/**
 * Byte-trace test of the replication client against [[FakeWalsender]] —
 * the 6-record scenario of the reference's `replicator_test.go:22-94`
 * (4 inserts across t/t2, 1 update, 1 delete, in one transaction)
 * through startup → auth → slot create/resume → CopyBoth → XLogData →
 * standby status, over a real localhost socket.
 */
class PgReplicationClientSpec extends AnyFunSuite {

  // ---- wal2json format-version-2 frames for the reference scenario ----
  private val CommitLsnText = "0/3910B898"
  private val CommitLsn = Lsn.parse(CommitLsnText)

  private def ins(table: String, id: Int, name: String): String =
    s"""{"action":"I","xid":766,"lsn":"0/3910B7F0","nextlsn":"","timestamp":"2023-08-22 14:44:02-03","schema":"public","table":"$table","columns":[{"name":"id","type":"integer","value":$id},{"name":"name","type":"text","value":"$name"}],"pk":[{"name":"id","type":"integer"}]}"""

  private val scenario: Seq[String] = Seq(
    s"""{"action":"B","xid":766,"lsn":"0/3910B7F0","nextlsn":"$CommitLsnText","timestamp":"2023-08-22 14:44:02-03"}""",
    ins("t", 1, "foo"),
    ins("t", 2, "bar"),
    ins("t2", 4, "foo2"),
    ins("t", 3, "baz"),
    s"""{"action":"U","xid":766,"lsn":"0/3910B820","nextlsn":"","timestamp":"2023-08-22 14:44:02-03","schema":"public","table":"t","columns":[{"name":"id","type":"integer","value":3},{"name":"name","type":"text","value":"quz"}],"identity":[{"name":"id","type":"integer","value":3}],"pk":[{"name":"id","type":"integer"}]}""",
    s"""{"action":"D","xid":766,"lsn":"0/3910B850","nextlsn":"","timestamp":"2023-08-22 14:44:02-03","schema":"public","table":"t","identity":[{"name":"id","type":"integer","value":2}],"pk":[{"name":"id","type":"integer"}]}""",
    s"""{"action":"C","xid":766,"lsn":"0/3910B870","nextlsn":"$CommitLsnText","timestamp":"2023-08-22 14:44:02-03"}""")

  private def framesOf(payloads: Seq[String]): Seq[(Long, String)] =
    payloads.zipWithIndex.map { case (p, i) => (0x3910B000L + i * 8, p) }

  private def newClient(port: Int, password: Option[String] = None,
                        readTimeoutMs: Int = 20000): PgReplicationClient =
    new PgReplicationClient("127.0.0.1", port, "repl_user", "testdb", password,
      connectTimeoutMs = 5000, readTimeoutMs = readTimeoutMs)

  test("full session: trust auth, slot create, CopyBoth, 6-record tx, standby ack") {
    val server = new FakeWalsender(
      auth = FakeWalsender.Trust,
      slotLsn = None,
      consistentPoint = 0x3910B000L,
      publications = Map("pub_basin_t" -> Seq("public" -> "t", "public" -> "t2")),
      stream = framesOf(scenario))
    val client = newClient(server.port)
    try {
      client.connect()

      // publication discovery (conn.go:18-44)
      assert(client.publicationTables("pub_basin_t") == Seq("public.t", "public.t2"))

      // no slot yet → CREATE_REPLICATION_SLOT, resume at consistent point
      assert(client.confirmedFlushLsn("graft_pub_basin_t").isEmpty)
      val startLsn = client.createReplicationSlot("graft_pub_basin_t")
      assert(startLsn == 0x3910B000L)
      assert(server.createdSlots.peek() == "graft_pub_basin_t")

      client.startReplication("graft_pub_basin_t", startLsn,
        PgWalFeed.pluginOptions(Seq("public.t", "public.t2")))
      server.awaitStreamed()

      // the wire command carries the padded LSN and the wal2json options
      val startSql = {
        var s: String = null
        server.queries.forEach(q => if (q.startsWith("START_REPLICATION")) s = q)
        s
      }
      assert(startSql.contains("""SLOT "graft_pub_basin_t" LOGICAL 0/3910B000"""))
      assert(startSql.contains(""""format-version" '2'"""))
      assert(startSql.contains(""""add-tables" 'public.t,public.t2'"""))

      // receive all 8 frames; payloads byte-exact; assemble B..C like
      // replicator.go:160-204 and check the replicator_test assertions
      val builder = new Wal2JsonTxBuilder
      var tx: Option[(Long, String)] = None
      val payloads = Vector.newBuilder[String]
      while (tx.isEmpty) {
        client.receive() match {
          case Some(Right(x)) =>
            val p = new String(x.payload, StandardCharsets.UTF_8)
            payloads += p
            tx = builder.feed(p)
          case Some(Left(_)) => ()
          case None => fail("stream closed before commit")
        }
      }
      assert(payloads.result() == scenario)

      val (lsn, line) = tx.get
      assert(lsn == CommitLsn)
      val env = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
      assert(env.get("commit_lsn").asLong == CommitLsn)
      val records = env.get("records")
      assert(records.size == 6) // require.Equal(t, 6, len(tx.Records))
      assert(records.get(0).get("table").asText == "t")
      assert(records.get(0).get("columns").get(0).get("name").asText == "id")
      assert(records.get(0).get("columns").get(0).get("value").asInt == 1)
      assert(records.get(0).get("columns").get(1).get("value").asText == "foo")
      assert(records.get(2).get("table").asText == "t2")
      assert(records.get(2).get("columns").get(0).get("value").asInt == 4)
      assert(records.get(2).get("columns").get(1).get("value").asText == "foo2")
      assert(records.get(4).get("action").asText == "U")
      assert(records.get(5).get("action").asText == "D")

      // the Commit(ctx, lsn) analog: standby status advances the server ack
      client.sendStandbyStatus(CommitLsn)
      val deadline = System.nanoTime() + 10e9.toLong
      while (server.acks.isEmpty && System.nanoTime() < deadline) Thread.sleep(10)
      assert(server.acks == Seq(CommitLsn))
      server.check()
    } finally { client.close(); server.close() }
  }

  test("md5 auth: correct password connects; wrong password is a clean failure") {
    val ok = new FakeWalsender(auth = FakeWalsender.Md5("s3cret"))
    val c1 = newClient(ok.port, Some("s3cret"))
    try { c1.connect() } finally { c1.close(); ok.close() }

    val bad = new FakeWalsender(auth = FakeWalsender.Md5("s3cret"))
    val c2 = newClient(bad.port, Some("wrong"))
    try {
      val e = intercept[RuntimeException](c2.connect())
      assert(e.getMessage.contains("28P01"))
    } finally { c2.close(); bad.close() }
  }

  test("resume: an existing slot's confirmed_flush_lsn is honored") {
    val server = new FakeWalsender(slotLsn = Some(0x16B374D848L))
    val client = newClient(server.port)
    try {
      client.connect()
      assert(client.confirmedFlushLsn("graft_pub") == Some(0x16B374D848L))
    } finally { client.close(); server.close() }
  }

  test("keepalive frames surface with the reply-requested flag") {
    val server = new FakeWalsender(
      stream = Nil,
      trailer = Seq(FakeWalsender.keepalive(0x99L, replyRequested = true)))
    val client = newClient(server.port)
    try {
      client.connect()
      client.startReplication("graft_pub", 0L, Nil)
      client.receive() match {
        case Some(Left(ka)) => assert(ka.walEnd == 0x99L && ka.replyRequested)
        case other => fail(s"expected keepalive, got $other")
      }
    } finally { client.close(); server.close() }
  }

  test("an unknown CopyData sub-message fails loudly instead of dropping WAL") {
    val server = new FakeWalsender(trailer = Seq(Array[Byte]('z', 1, 2, 3)))
    val client = newClient(server.port)
    try {
      client.connect()
      client.startReplication("graft_pub", 0L, Nil)
      val e = intercept[RuntimeException](client.receive())
      assert(e.getMessage.contains("unknown replication CopyData sub-message 'z'"))
    } finally { client.close(); server.close() }
  }

  test("a dead-silent server surfaces as a read timeout, not a hang") {
    val server = new FakeWalsender(auth = FakeWalsender.Silent)
    val client = newClient(server.port, readTimeoutMs = 300)
    try {
      intercept[java.net.SocketTimeoutException](client.connect())
    } finally { client.close(); server.close() }
  }

  test("identifier validation rejects injectable slot names before any SQL is sent") {
    val server = new FakeWalsender()
    val client = newClient(server.port)
    try {
      client.connect()
      intercept[IllegalArgumentException](client.createReplicationSlot("""x" LOGICAL evil"""))
      intercept[IllegalArgumentException](
        client.startReplication("ok_slot", 0L, Seq("bad opt!" -> "v")))
      assert(!server.queries.asScala.exists(_.contains("evil")))
    } finally { client.close(); server.close() }
  }
}
