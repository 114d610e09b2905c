package graft.cdc.pgwire

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/**
 * Records a REAL walsender session as the committed trace fixture
 * (`src/test/resources/pgwire/walsender-pg-pgoutput.trace` + `.json`
 * sidecar) — run with `sbt "Test/runMain graft.cdc.pgwire.RecordWalsenderTrace"`
 * in an environment with Postgres server binaries.
 *
 * Session (all parameters pinned so the replay is deterministic):
 * throwaway cluster → db `cdc_trace`, table, publication → replication
 * role `repl` with an MD5-hashed password (the TCP HBA rule forces md5,
 * so live MD5 auth is on the recorded path) → slot pre-created via
 * `pg_create_logical_replication_slot` → two DML transactions → the
 * [[WalsenderTrace.driveSession]] script through a [[RecordingProxy]]:
 * resume slot, START_REPLICATION (pgoutput), assemble 2 envelopes,
 * standby-status ack, Terminate. The sidecar stores the session
 * parameters and the envelopes the live run produced; the replay spec
 * asserts byte equality of the client stream (clock fields masked) AND
 * envelope equality against a real server's bytes.
 */
object RecordWalsenderTrace {
  def main(args: Array[String]): Unit = {
    require(PgLocalCluster.available, "no postgres server binaries found")
    val tmp = Files.createTempDirectory("pg-trace")
    val cluster = new PgLocalCluster(tmp)
    cluster.start()
    try {
      val su = cluster.sqlClient()
      try {
        su.simpleQuery("SET password_encryption = 'md5'; " +
          "CREATE ROLE repl LOGIN REPLICATION PASSWORD 'tracepw'")
        su.simpleQuery("CREATE DATABASE cdc_trace")
      } finally su.close()

      val db = cluster.sqlClient(db = "cdc_trace")
      try {
        db.simpleQuery("CREATE TABLE t(id int PRIMARY KEY, name text)")
        db.simpleQuery("GRANT SELECT ON t TO repl")
        db.simpleQuery("CREATE PUBLICATION pub FOR TABLE t")
        // slot first (via SQL, owned by repl so START_REPLICATION may use
        // it), then the DML the stream must replay
        val replSql = cluster.sqlClient(db = "cdc_trace", user = "repl",
          password = Some("tracepw"))
        try replSql.simpleQuery(
          "SELECT pg_create_logical_replication_slot('graft_pub', 'pgoutput')")
        finally replSql.close()
        db.simpleQuery("INSERT INTO t VALUES (1, 'one'); INSERT INTO t VALUES (2, 'two')")
        db.simpleQuery("UPDATE t SET name = 'TWO' WHERE id = 2; DELETE FROM t WHERE id = 1")
      } finally db.close()

      val proxy = new RecordingProxy(cluster.host, cluster.port)
      val client = new PgReplicationClient("127.0.0.1", proxy.port, "repl", "cdc_trace",
        password = Some("tracepw"))
      val envelopes =
        try WalsenderTrace.driveSession(client, "pub", "graft_pub", expectCommits = 2)
        finally client.close()
      val frames = proxy.frames()
      proxy.close()

      val outDir = Paths.get("src/test/resources/pgwire")
      Files.createDirectories(outDir)
      WalsenderTrace.write(outDir.resolve("walsender-pg-pgoutput.trace"), frames)
      val version = {
        val c = cluster.sqlClient()
        try c.simpleQuery("SHOW server_version").head("server_version").getOrElse("?")
        finally c.close()
      }
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val side = mapper.createObjectNode()
      side.put("server_version", version)
      side.put("user", "repl"); side.put("password", "tracepw")
      side.put("database", "cdc_trace"); side.put("publication", "pub")
      side.put("slot", "graft_pub"); side.put("expect_commits", 2)
      val envArr = side.putArray("envelopes")
      envelopes.foreach { case (lsn, line) =>
        val o = envArr.addObject(); o.put("commit_lsn", lsn); o.put("line", line); ()
      }
      Files.write(outDir.resolve("walsender-pg-pgoutput.json"),
        mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(side))
      println(s"recorded ${frames.size} coalesced frames from a live pg $version walsender; " +
        s"${envelopes.size} envelopes")
      println(envelopes.map(_._2).mkString("\n"))
    } finally cluster.close()
  }
}
