package graft.cdc.pgwire

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/**
 * Manages a throwaway single-node PostgreSQL cluster for live tests —
 * the sandbox-local equivalent of the reference's Docker test container
 * (`test/postgres.go:49-94`): initdb into a temp dir, `wal_level=logical`,
 * trust auth on loopback, start/stop via pg_ctl. Specs must gate on
 * [[PgLocalCluster.available]] and `cancel` when no server binaries
 * exist, so the suite stays green in environments without Postgres.
 */
object PgLocalCluster {
  /** Locate a server bin directory holding initdb+pg_ctl+postgres. */
  lazy val binDir: Option[Path] = {
    val fromPath = sys.env.getOrElse("PATH", "").split(':').map(Paths.get(_))
    val versioned =
      Seq("/usr/lib/postgresql", "/usr/pgsql").flatMap { root =>
        val r = Paths.get(root)
        if (Files.isDirectory(r)) {
          val s = Files.list(r)
          try s.iterator.asScala.map(_.resolve("bin")).toList finally s.close()
        } else Nil
      }
    (fromPath ++ versioned).find { d =>
      Seq("initdb", "pg_ctl", "postgres").forall(b => Files.isExecutable(d.resolve(b)))
    }
  }

  def available: Boolean = binDir.isDefined

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  /** Postgres refuses to run as root; when the JVM is root, server
    * commands are dropped to this unprivileged user via `runuser` (and
    * the cluster directory chown'd to it). */
  private val dropToUser: Option[String] =
    if (System.getProperty("user.name") == "root")
      Seq("postgres", "nobody").find { u =>
        new ProcessBuilder("id", "-u", u).start().waitFor() == 0
      }
    else None

  private def run(cmd: Seq[String], env: Map[String, String] = Map.empty,
                  cwd: Option[Path] = None): Unit = {
    val full = dropToUser.fold(cmd)(u => Seq("runuser", "-u", u, "--") ++ cmd)
    val pb = new ProcessBuilder(full.asJava)
    // the dropped user usually cannot enter the JVM's cwd — run server
    // commands from the cluster dir instead
    cwd.foreach(d => pb.directory(d.toFile))
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    val code = p.waitFor()
    require(code == 0, s"${full.head} exited $code:\n$out")
  }

  /** Make `dir` usable by the server user when privileges are dropped:
    * chown the tree, and make non-traversable ancestors traversable —
    * but ONLY ancestors strictly inside the JVM temp dir (a cluster dir
    * nested under 0700-root temp subdirs would otherwise be unreachable
    * for the dropped user). Ancestors outside the temp tree are never
    * touched: widening, say, /root would outlive the test; if such an
    * ancestor blocks traversal, initdb fails with a clear perm error
    * and the caller should pick a temp-dir-rooted location. */
  private[pgwire] def ownDir(dir: Path): Unit = dropToUser.foreach { u =>
    val p = new ProcessBuilder("chown", "-R", s"$u:", dir.toString).start()
    require(p.waitFor() == 0, s"chown $dir to $u failed")
    val tmpRoot = Paths.get(System.getProperty("java.io.tmpdir")).toAbsolutePath.normalize
    var a = dir.toAbsolutePath.normalize.getParent
    while (a != null && a.startsWith(tmpRoot) && a != tmpRoot) {
      val perms = Files.getPosixFilePermissions(a)
      if (!perms.contains(java.nio.file.attribute.PosixFilePermission.OTHERS_EXECUTE)) {
        perms.add(java.nio.file.attribute.PosixFilePermission.OTHERS_EXECUTE)
        Files.setPosixFilePermissions(a, perms)
      }
      a = a.getParent
    }
  }
}

final class PgLocalCluster(baseDir: Path, superuser: String = "graft") extends AutoCloseable {
  import PgLocalCluster._

  private val bin = binDir.getOrElse(sys.error("no postgres binaries found"))
  private val dataDir = baseDir.resolve("data")
  val port: Int = PgLocalCluster.freePort()
  val host = "127.0.0.1"

  /** initdb + logical-replication config + md5-capable HBA, then start. */
  def start(): Unit = {
    Files.createDirectories(baseDir)
    ownDir(baseDir)
    run(Seq(bin.resolve("initdb").toString, "-D", dataDir.toString,
      "-U", superuser, "--auth=trust", "--no-sync"), cwd = Some(baseDir))
    val conf =
      s"""listen_addresses = '$host'
         |port = $port
         |unix_socket_directories = '$baseDir'
         |wal_level = logical
         |max_wal_senders = 8
         |max_replication_slots = 8
         |fsync = off
         |""".stripMargin
    Files.write(dataDir.resolve("postgresql.auto.conf"), conf.getBytes(StandardCharsets.UTF_8))
    // loopback: trust for the superuser, md5 for everyone else — the md5
    // line lets trace-recording sessions exercise live MD5 auth
    val hba =
      s"""local all all trust
         |host all $superuser $host/32 trust
         |host all all $host/32 md5
         |host replication $superuser $host/32 trust
         |host replication all $host/32 md5
         |""".stripMargin
    Files.write(dataDir.resolve("pg_hba.conf"), hba.getBytes(StandardCharsets.UTF_8))
    run(Seq(bin.resolve("pg_ctl").toString, "-D", dataDir.toString, "-w",
      "-l", baseDir.resolve("pg.log").toString, "start"), cwd = Some(baseDir))
  }

  /** A plain (non-replication) pg-wire connection for DDL/DML. */
  def sqlClient(db: String = "postgres", user: String = superuser,
                password: Option[String] = None): PgReplicationClient = {
    val c = new PgReplicationClient(host, port, user, db, password = password,
      replicationMode = false)
    c.connect()
    c
  }

  /** A logical-replication connection (walsender mode). */
  def replicationClient(db: String, user: String = superuser,
                        password: Option[String] = None): PgReplicationClient =
    new PgReplicationClient(host, port, user, db, password = password)

  override def close(): Unit = {
    try run(Seq(bin.resolve("pg_ctl").toString, "-D", dataDir.toString, "-w",
      "-m", "immediate", "stop"), cwd = Some(baseDir))
    catch { case _: Throwable => () }
  }
}
