package graft.cli

import org.apache.spark.sql.SparkSession

/**
 * `vaults`-style entrypoint for spark-submit
 * (mirrors `cmd/vaults/main.go:25-46`):
 *
 *   spark-submit --class graft.cli.Main app.jar <providerRoot> <command> [args…]
 *
 *   create <ns.rel> <0xaccount> [cacheMins]
 *   list <0xaccount>
 *   events <ns.rel> [latest N]
 *   write <ns.rel> <file.parquet> [keyHex]
 *   stream <ns.rel> <walDir> <workDir> <schemaSpec> [windowSec] [keyHex]
 *   curate <in.parquet> <out.parquet>
 *   retrieve <cid> [output|-]
 *   compact <ns.rel> [keyHex]
 *   account-create <keyfile> | account-address <keyfile>
 *   sign <keyfile> <file>
 */
object Main {
  def main(args: Array[String]): Unit = sys.exit(run(args))

  def run(args: Array[String]): Int = {
    if (args.length < 2) { System.err.println(usage); return 2 }
    val providerRoot = args(0)
    val preexisting = SparkSession.getActiveSession.isDefined
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("vaults")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val v = new Vaults(spark, providerRoot,
      if (sys.env.get("VAULTS_FORMAT").contains("json")) OutputFormat.Json
      else OutputFormat.Table)
    try {
      args.drop(1).toList match {
        case "create" :: vault :: account :: rest =>
          v.create(vault, account, rest.headOption.map(_.toInt).getOrElse(0)); 0
        case "list" :: account :: Nil =>
          println(v.list(account)); 0
        case "events" :: vault :: rest =>
          val latest = rest match { case "latest" :: n :: Nil => Some(n.toInt); case _ => None }
          println(v.events(vault, latest = latest)); 0
        case "write" :: vault :: file :: rest =>
          println(v.write(vault, file, keyHex = rest.headOption)); 0
        case "retrieve" :: cid :: rest =>
          if (v.retrieve(cid, rest.headOption.getOrElse("-"))) 0
          else { System.err.println(s"not found: $cid"); 1 }
        case "stream" :: vault :: walDir :: workDir :: schemaSpec :: rest =>
          val windowSec = rest.headOption.map(_.toLong).getOrElse(3600L)
          val q = v.stream(vault, graft.cdc.TableSchema.parseSpec(schemaSpec),
            walDir, workDir, windowSec, keyHex = rest.drop(1).headOption,
            availableNow = sys.env.get("VAULTS_AVAILABLE_NOW").contains("1"))
          q.awaitTermination(); 0
        case "curate" :: in :: out :: Nil =>
          val (nIn, nKept) = v.curate(in, out)
          println(s"$nIn -> $nKept"); 0
        case "compact" :: vault :: rest =>
          v.compact(vault, keyHex = rest.headOption) match {
            case Some(cid) => println(cid); 0
            case None => System.err.println("nothing to compact"); 1
          }
        case "account-create" :: keyFile :: Nil =>
          println(v.accountCreate(keyFile)); 0
        case "account-address" :: keyFile :: Nil =>
          println(v.accountAddress(keyFile)); 0
        case "sign" :: keyFile :: file :: Nil =>
          println(v.sign(keyFile, file)); 0
        case other =>
          System.err.println(s"unknown command: ${other.mkString(" ")}\n$usage"); 2
      }
    } catch {
      case e: Exception => System.err.println(s"error: ${e.getMessage}"); 1
    } finally if (!preexisting) spark.stop() // don't kill a host session
  }

  private val usage: String =
    """usage: vaults <providerRoot> <command> [args…]
      |  create <ns.rel> <0xaccount> [cacheMins]
      |  list <0xaccount>
      |  events <ns.rel> [latest N]
      |  write <ns.rel> <file.parquet> [keyHex]
      |  stream <ns.rel> <walDir> <workDir> <schemaSpec> [windowSec] [keyHex]
      |  curate <in.parquet> <out.parquet>
      |  retrieve <cid> [output|-]
      |  compact <ns.rel> [keyHex]
      |  account-create <keyfile> | account-address <keyfile>
      |  sign <keyfile> <file>""".stripMargin
}
