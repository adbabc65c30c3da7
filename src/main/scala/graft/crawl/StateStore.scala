package graft.crawl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Snapshot-versioned, atomically-committed table state — the engine's
 * MERGE-based checkpoint (`BASELINE.json.north_rule`: "resumable from
 * checkpoint with per-partition lineage").
 *
 * In production this is an Iceberg table and each batch ends in
 * `MERGE INTO frontier/seen/ledger` + one snapshot commit; this container
 * ships no Iceberg jars, so the same semantics are implemented directly:
 *
 *  - every batch writes each state table under `<table>/v=<batch>` (parquet);
 *  - a single store-level `_COMMITTED` pointer is then flipped via
 *    write-temp + ATOMIC_MOVE — the one-file analog of an Iceberg snapshot
 *    commit covering all tables of the batch;
 *  - readers resolve `_COMMITTED` and read only that version, so a job
 *    killed mid-batch leaves orphan `v=K+1` files that the retry simply
 *    overwrites (mode=overwrite ⇒ idempotent, exactly-once state);
 *  - "MERGE" = union(current, updates) + latest-wins per key, written as the
 *    next version (same observable result as MERGE WHEN MATCHED UPDATE /
 *    WHEN NOT MATCHED INSERT keyed on url_hash).
 *
 * Reference analog: the crawl resumes from config.json cursors + start_page
 * (weibo.py:66, weibo.py:2814-2817) and the tasks ledger
 * (service.py:140-154); here the checkpoint IS the table state.
 */
class StateStore(spark: SparkSession, root: String) {

  private val rootPath: Path = Paths.get(root)
  Files.createDirectories(rootPath)
  private val committedFile = rootPath.resolve("_COMMITTED")

  /** Last fully-committed batch id; -1 if none. */
  def committedBatch: Long =
    if (Files.exists(committedFile))
      new String(Files.readAllBytes(committedFile), StandardCharsets.UTF_8).trim.toLong
    else -1L

  /** Atomically advance the store-level commit pointer (snapshot commit analog). */
  def commit(batch: Long): Unit = {
    val tmp = rootPath.resolve(s"_COMMITTED.tmp.$batch")
    Files.write(tmp, batch.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, committedFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def versionDir(table: String, v: Long): String =
    rootPath.resolve(table).resolve(s"v=$v").toString

  def exists(table: String, v: Long): Boolean =
    Files.exists(Paths.get(versionDir(table, v), "_SUCCESS"))

  /** Read table state at the given (committed) version; empty DF w/ given schema if absent. */
  def read(table: String, v: Long, schemaOf: => DataFrame): DataFrame =
    if (exists(table, v)) spark.read.parquet(versionDir(table, v))
    else schemaOf.limit(0)

  /** Write the next version of a table (overwrite ⇒ retry-idempotent). */
  def write(table: String, v: Long, df: DataFrame, partitions: Int = 0): Unit = {
    val out = if (partitions > 0) df.repartition(partitions) else df
    out.write.mode("overwrite").parquet(versionDir(table, v))
  }

  /** Append-only log table written per batch under `<table>/batch=<id>`;
    * retry overwrites the same directory (idempotent). Readers filter
    * `batch <= committedBatch` so uncommitted partial output is invisible —
    * snapshot isolation, as an Iceberg append would give. */
  def appendLog(table: String, batch: Long, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(rootPath.resolve(table).resolve(s"batch=$batch").toString)

  /** Generic MERGE with latest-wins semantics (the reference's upsert sinks:
    * SQLite INSERT OR REPLACE weibo.py:2530-2541, MySQL ON DUPLICATE KEY
    * weibo.py:2105-2147, Mongo find+update weibo.py:2040-2064, JSON
    * merge-by-id weibo.py:1959-1996 — all are MERGE INTO keyed on id):
    * union current state with updates, keep the newest row per key, write the
    * next version. Call commit() after all tables of the batch are written. */
  def mergeLatestWins(table: String, v: Long, updates: DataFrame,
      keyCols: Seq[String], versionOrder: Seq[org.apache.spark.sql.Column]): Unit = {
    val current = if (exists(table, v - 1)) Some(spark.read.parquet(versionDir(table, v - 1))) else None
    val unioned = current.map(_.unionByName(updates)).getOrElse(updates)
    write(table, v, graft.operators.QueryPack.latestWins(unioned, keyCols, versionOrder))
  }

  def readLog(table: String, upToBatch: Long): Option[DataFrame] = {
    val dir = rootPath.resolve(table)
    if (!Files.exists(dir)) return None
    val parts = Files.list(dir).iterator()
    var found = List.empty[String]
    while (parts.hasNext) {
      val p = parts.next()
      val name = p.getFileName.toString
      if (name.startsWith("batch=") && name.drop(6).toLong <= upToBatch)
        found ::= p.toString
    }
    if (found.isEmpty) None
    else Some(spark.read.option("basePath", dir.toString).parquet(found: _*))
  }
}
