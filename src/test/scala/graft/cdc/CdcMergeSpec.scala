package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.Encoders

/** CDC merge/upsert materialization: latest live row per PK in WAL
  * commit order; DELETE as final image removes the key. */
class CdcMergeSpec extends SparkSpec {

  private val schemaT = TableSchema("t", Seq(
    TableColumn("id", "integer", nullable = false, isPrimary = true),
    TableColumn("name", "text", nullable = true, isPrimary = false)))

  private def tx(lsn: Long, action: String, id: Int, name: String): String =
    s"""{"commit_lsn": $lsn, "records": [{"action": "$action", "xid": 1,
       |"lsn": "0/$lsn", "nextlsn": "", "timestamp": "t", "schema": "public",
       |"table": "t", "columns": [
       |  {"name": "id", "type": "integer", "value": $id},
       |  {"name": "name", "type": "text", "value": "$name"}],
       |"pk": [{"name": "id", "type": "integer"}]}]}"""
      .stripMargin.replace("\n", " ")

  private def lines(ls: String*) =
    spark.createDataset(ls)(Encoders.STRING).toDF("value")

  test("latest state: updates override, deletes remove, inserts survive") {
    val feed = lines(
      tx(1, "I", 1, "one"),
      tx(2, "I", 2, "two"),
      tx(3, "I", 3, "three"),
      tx(4, "U", 1, "one-v2"),   // update id 1
      tx(5, "D", 2, "two"),      // delete id 2
      tx(6, "U", 1, "one-v3"),   // second update wins by commit order
      tx(7, "I", 2, "two-back")  // re-insert after delete
    )
    val state = CdcMerge.latestState(feed, schemaT)
      .orderBy("id").collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("name")))
    assert(state.toSeq == Seq(1 -> "one-v3", 2 -> "two-back", 3 -> "three"))
  }

  test("commit order decides, not input order (shuffle-safe)") {
    // same history fed in scrambled line order across many partitions
    val feed = lines(
      tx(6, "U", 1, "final"),
      tx(1, "I", 1, "first"),
      tx(4, "U", 1, "middle")
    ).repartition(5)
    val state = CdcMerge.latestState(feed, schemaT).collect()
    assert(state.length == 1 && state(0).getAs[String]("name") == "final")
  }

  test("delete as final image drops the key entirely") {
    val feed = lines(tx(1, "I", 9, "x"), tx(2, "U", 9, "y"), tx(3, "D", 9, "y"))
    assert(CdcMerge.latestState(feed, schemaT).count() == 0)
  }

  test("streaming latest-state: state evolves across micro-batch rounds") {
    val base = java.nio.file.Files.createTempDirectory("cdcmerge").toString
    val wal = s"$base/wal"; val state = s"$base/state"; val ckpt = s"$base/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(wal))
    def run(): Unit = {
      val q = CdcMerge.streamingLatestState(spark, wal, schemaT, state, ckpt)
      q.awaitTermination(120000); ()
    }
    def readState(): Seq[(Int, String)] =
      CdcMerge.readState(spark, state).get.orderBy("id").collect()
        .map(r => (r.getAs[Int]("id"), r.getAs[String]("name"))).toSeq

    // round 1: two inserts
    java.nio.file.Files.writeString(java.nio.file.Paths.get(wal, "a.json"),
      Seq(tx(1, "I", 1, "one"), tx(2, "I", 2, "two")).mkString("\n"))
    run()
    assert(readState() == Seq(1 -> "one", 2 -> "two"))

    // round 2: update id 1, delete id 2, insert id 3 — only new lines read
    java.nio.file.Files.writeString(java.nio.file.Paths.get(wal, "b.json"),
      Seq(tx(3, "U", 1, "one-v2"), tx(4, "D", 2, "two"),
          tx(5, "I", 3, "three")).mkString("\n"))
    run()
    assert(readState() == Seq(1 -> "one-v2", 3 -> "three"))

    // crash recovery: an orphaned version dir + stale tmp pointer (crash
    // mid-batch, before the pointer flip) must not confuse the next batch
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(state, "state-v000000999999"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(state, "CURRENT.tmp"), "state-v000000999999")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(wal, "c.json"),
      Seq(tx(6, "I", 4, "four")).mkString("\n"))
    run()
    assert(readState() == Seq(1 -> "one-v2", 3 -> "three", 4 -> "four"))
    // GC removed the orphan; live version + ONE superseded version of
    // grace remain (an external reader resolved under the old pointer
    // may still be scanning it)
    val versions = graft.core.FsUtil.listDir(java.nio.file.Paths.get(state))
      .map(_.getFileName.toString).filter(_.startsWith("state-v")).sorted
    assert(!versions.contains("state-v000000999999")) // orphan collected
    assert(versions.length <= 2 && versions.nonEmpty)
    val current = java.nio.file.Files.readString(
      java.nio.file.Paths.get(state, "CURRENT")).trim
    assert(versions.last == current) // newest version is the live one
  }

  test("streaming archival view: fresh at every version, batch == streaming") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("cdcarch").toString
    val wal = s"$base/wal"; val state = s"$base/state"; val ckpt = s"$base/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(wal))
    // vault = id % 2; upload time = commit-lsn minutes past epoch (any
    // deterministic micros expression over the state columns works —
    // the merge keeps commit_lsn? no: state has only schema columns, so
    // derive ts_us from id). vault 0 never caches (no dims row -> epoch
    // expiry, archived from the start); vault 1 caches 100 minutes.
    val dims = Seq((1, 100L)).toDF("vault", "cache_duration")
    val archSpec = CdcMerge.ArchivalSpec(
      vaultDims = dims,
      vault = col("id") % 2,
      tsUs = col("id").cast("long") * 60000000L) // minute id = upload time
    def run(): Unit = {
      val q = CdcMerge.streamingLatestState(spark, wal, schemaT, state, ckpt,
        archival = Some(archSpec))
      q.awaitTermination(120000); ()
    }
    def check(): Seq[(Int, Long, Long)] = {
      // the committed view must equal the batch recomputation over the
      // SAME version's state — the batch ≡ streaming contract
      val streaming = CdcMerge.readArchival(spark, state).get
      val batch = CdcMerge.archivalView(CdcMerge.readState(spark, state).get, archSpec)
      assert(streaming.exceptAll(batch).isEmpty && batch.exceptAll(streaming).isEmpty,
        "committed _archival view diverged from batch recomputation")
      streaming.orderBy("id").collect()
        .map(r => (r.getAs[Int]("id"), r.getAs[Long]("cache_expiry_us"),
          r.getAs[Long]("is_archived"))).toSeq
    }

    // round 1: ids 1 (vault 1, cached) and 2 (vault 0, never cached).
    // as-of = max ts_us = id 2's upload minute; id 1's expiry is minute
    // 1 + 100 > as-of -> still cached; id 2 archived from the start.
    java.nio.file.Files.writeString(java.nio.file.Paths.get(wal, "a.json"),
      Seq(tx(1, "I", 1, "one"), tx(2, "I", 2, "two")).mkString("\n"))
    run()
    assert(check() == Seq(
      (1, 101L * 60000000L, 0L),
      (2, 0L, 1L)))

    // round 2: id 1 deleted (leaves the view with the state), id 203
    // inserted — as-of jumps to minute 203, PAST id 1's old expiry; the
    // view stays fresh under ingest instead of batch-recomputed later
    java.nio.file.Files.writeString(java.nio.file.Paths.get(wal, "b.json"),
      Seq(tx(3, "D", 1, "one"), tx(4, "I", 203, "late")).mkString("\n"))
    run()
    assert(check() == Seq(
      (2, 0L, 1L),
      (203, 303L * 60000000L, 0L))) // odd id -> vault 1, freshly cached
  }

  test("incremental ECMH digest equals from-scratch digest at every version") {
    val base = java.nio.file.Files.createTempDirectory("cdcdigest").toString
    val wal = s"$base/wal"; val state = s"$base/state"; val ckpt = s"$base/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(wal))
    def run(): Unit = {
      val q = CdcMerge.streamingLatestState(spark, wal, schemaT, state, ckpt,
        withDigest = true)
      q.awaitTermination(120000); ()
    }
    def check(tag: String): String = {
      val incremental = CdcMerge.readStateDigest(state).get
      val scratch = CdcMerge.stateDigest(
        CdcMerge.readState(spark, state).get
          .select(schemaT.columns.map(c => org.apache.spark.sql.functions.col(c.name)): _*),
        schemaT)
      assert(incremental == scratch, s"$tag: O(delta) digest != O(table) digest")
      incremental
    }

    // batch 1: inserts only
    java.nio.file.Files.writeString(java.nio.file.Paths.get(wal, "a.json"),
      Seq(tx(1, "I", 1, "one"), tx(2, "I", 2, "two")).mkString("\n"))
    run()
    val d1 = check("after inserts")

    // batch 2: update + delete + insert — digest updated from CHANGED
    // keys only, still equal to a full rescan
    java.nio.file.Files.writeString(java.nio.file.Paths.get(wal, "b.json"),
      Seq(tx(3, "U", 1, "one-v2"), tx(4, "D", 2, "two"),
          tx(5, "I", 3, "three")).mkString("\n"))
    run()
    val d2 = check("after update/delete/insert")
    assert(d2 != d1)

    // batch 3: revert id 1 and re-insert id 2 — same LIVE ROWS as a
    // table that was never touched would have ⇒ same digest as a fresh
    // from-scratch hash of those rows (content-determined, not
    // history-determined)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(wal, "c.json"),
      Seq(tx(6, "U", 1, "one"), tx(7, "I", 2, "two"), tx(8, "D", 3, "three"))
        .mkString("\n"))
    run()
    check("after revert")
    val rows = CdcMerge.readState(spark, state).get.orderBy("id").collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("name"))).toSeq
    assert(rows == Seq(1 -> "one", 2 -> "two"))
  }

  test("wal2json-shaped DELETE: old key in identity, no columns") {
    // real wal2json format-2 D records carry the replica-identity key in
    // `identity` and have NO `columns` — the merge must still drop the row
    def dtx(lsn: Long, id: Int): String =
      s"""{"commit_lsn": $lsn, "records": [{"action": "D", "xid": 1,
         |"lsn": "0/$lsn", "nextlsn": "", "timestamp": "t", "schema": "public",
         |"table": "t",
         |"identity": [{"name": "id", "type": "integer", "value": $id}],
         |"pk": [{"name": "id", "type": "integer"}]}]}"""
        .stripMargin.replace("\n", " ")
    val feed = lines(tx(1, "I", 1, "one"), tx(2, "I", 2, "two"), dtx(3, 1))
    val state = CdcMerge.latestState(feed, schemaT).collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("name")))
    assert(state.toSeq == Seq(2 -> "two"))
  }

  test("delete-then-reinsert with identity-only deletes") {
    def dtx(lsn: Long, id: Int): String =
      s"""{"commit_lsn": $lsn, "records": [{"action": "D", "xid": 1,
         |"lsn": "0/$lsn", "nextlsn": "", "timestamp": "t", "schema": "public",
         |"table": "t",
         |"identity": [{"name": "id", "type": "integer", "value": $id}],
         |"pk": [{"name": "id", "type": "integer"}]}]}"""
        .stripMargin.replace("\n", " ")
    val feed = lines(tx(1, "I", 7, "a"), dtx(2, 7), tx(3, "I", 7, "b"))
    val state = CdcMerge.latestState(feed, schemaT).collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("name")))
    assert(state.toSeq == Seq(7 -> "b"))
  }

  test("latest state equals a naive ordered fold on a randomized I/U/D history") {
    // wal2json-shaped D: no columns, old key in identity
    def dtxId(lsn: Long, id: Int): String =
      s"""{"commit_lsn": $lsn, "records": [{"action": "D", "xid": 1,
         |"lsn": "0/$lsn", "nextlsn": "", "timestamp": "t", "schema": "public",
         |"table": "t",
         |"identity": [{"name": "id", "type": "integer", "value": $id}],
         |"pk": [{"name": "id", "type": "integer"}]}]}"""
        .stripMargin.replace("\n", " ")
    val rnd = new scala.util.Random(42) // deterministic
    val hist = (1 to 300).map { lsn =>
      val id = rnd.nextInt(20)
      val action = Seq("I", "U", "D")(rnd.nextInt(3))
      (lsn.toLong, action, id, s"v$lsn")
    }
    // reference semantics: apply in commit order; I/U upsert, D removes
    val expected = hist.foldLeft(Map.empty[Int, String]) {
      case (m, (_, "D", id, _)) => m - id
      case (m, (_, _, id, v)) => m + (id -> v)
    }
    // the SAME history in scrambled line order across partitions; half
    // the deletes use the real wal2json identity-only wire shape, half
    // the repo's columns-populated synthetic shape — both must merge
    val scrambled = rnd.shuffle(hist).map {
      case (lsn, "D", id, _) if lsn % 2 == 0 => dtxId(lsn, id)
      case (lsn, a, id, v) => tx(lsn, a, id, v)
    }
    val feed = lines(scrambled: _*).repartition(7)
    val state = CdcMerge.latestState(feed, schemaT).collect()
      .map(r => r.getAs[Int]("id") -> r.getAs[String]("name")).toMap
    assert(state == expected)
    assert(expected.nonEmpty) // non-trivial case
  }

  test("no primary key is rejected") {
    val noPk = TableSchema("t", Seq(
      TableColumn("id", "integer", nullable = false, isPrimary = false)))
    intercept[IllegalArgumentException](CdcMerge.latestState(lines(), noPk))
  }
}
