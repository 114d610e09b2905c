package graft.engine

import org.apache.spark.sql.SparkSession

/**
 * Streaming state-store backend selection. The default HDFS-backed
 * provider keeps every key in executor heap — fine for bounded tx
 * assembly, a ceiling for large dedup/watermark state. RocksDB (shipped
 * with Spark, `rocksdbjni` on the classpath) spills state to local disk
 * with changelog checkpointing, which is the 100 TB shape for
 * [[graft.cdc.TxAssembler]]'s per-xid buffers and streaming dedup's
 * fingerprint set: state size is bounded by disk, not heap, and restore
 * cost by the changelog, not a full snapshot.
 *
 * Provider choice is read per-query at START from the session conf, so
 * `use`/`withBackend` must wrap query start, not just session creation.
 */
object StateBackend {
  val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
  val RocksDb = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  val Default = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
  private val ChangelogConf =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  def useRocksDb(spark: SparkSession): Unit = {
    spark.conf.set(ProviderConf, RocksDb)
    // incremental checkpoints: upload the delta, not the full SST set
    spark.conf.set(ChangelogConf, "true")
  }

  def useDefault(spark: SparkSession): Unit = spark.conf.set(ProviderConf, Default)

  /** Run `f` (typically: define + start + drain a streaming query) with
    * the given provider, restoring the previous setting after. */
  def withBackend[T](spark: SparkSession, provider: String)(f: => T): T = {
    val prev = spark.conf.getOption(ProviderConf)
    spark.conf.set(ProviderConf, provider)
    if (provider == RocksDb) spark.conf.set(ChangelogConf, "true")
    try f
    finally prev match {
      case Some(p) => spark.conf.set(ProviderConf, p)
      case None => spark.conf.unset(ProviderConf)
    }
  }
}
