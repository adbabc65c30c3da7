package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * The reference's read-side query surface (SURVEY.md §2.3-2.6) as reusable
 * Dataset operators. Each is a declarative plan — Catalyst handles pushdown,
 * join strategy, and partial aggregation; none of these collect to the
 * driver, so all scale with executors.
 */
object QueryPack {

  /** W3 — top-k per group (comments-per-weibo top-k,
    * /root/reference/util/pdf_exporter.py:392-402; also the frontier's
    * per-host fetch-budget selection). Deterministic via total tiebreak
    * order supplied by the caller. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column], k: Int,
      rankName: String = "rk"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankName, row_number().over(w).cast("long"))
      .filter(col(rankName) <= k)
  }

  /** W5 — LIMIT/OFFSET pagination (service.py:3088-3103).
    * `orderBy(...).limit(page·size)` plans as TakeOrderedAndProject —
    * per-partition partial top-k then a driver-side merge of page·size rows —
    * so the big side never collapses into a single-task global sort (the
    * un-partitioned `Window.orderBy` shape does exactly that at scale). The
    * offset is then applied on the bounded ≤ page·size prefix, where a
    * single-partition window is O(page·size), not O(|table|).
    *
    * `order ++ tiebreak` MUST be a total order: with ties at the prefix
    * boundary, the partial top-k's tie selection and the window's re-rank are
    * two independent choices, so a tied row could be dropped from or repeated
    * across consecutive pages (ADVICE r2). Pass a unique key column as
    * `tiebreak` when `order` alone isn't total.
    * For deep pages prefer [[pageAfter]] (keyset pagination). */
  def paginate(df: DataFrame, order: Seq[Column], page: Int, pageSize: Int,
      tiebreak: Seq[Column] = Nil): DataFrame = {
    val total = order ++ tiebreak
    val prefix = df.orderBy(total: _*).limit(page * pageSize)
    val w = Window.orderBy(total: _*)
    prefix.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") > (page - 1).toLong * pageSize)
      .drop("_rn")
  }

  /** W5 at scale — keyset pagination: `WHERE key > last_seen ORDER BY key
    * LIMIT size` is O(size) regardless of page depth (the reference's
    * OFFSET walk re-reads every earlier page, service.py:3088-3103).
    * `afterPredicate` encodes the caller's (last_ts, last_id) cursor, e.g.
    * `ts < lit(t) || (ts === lit(t) && id > lit(i))` for a DESC walk. */
  def pageAfter(df: DataFrame, order: Seq[Column], afterPredicate: Column,
      pageSize: Int): DataFrame =
    df.filter(afterPredicate).orderBy(order: _*).limit(pageSize)

  /** W4 — prev/next navigation (service.py:3181-3211, 2564-2638): one window
    * pass replaces the reference's two point queries per row. */
  def prevNext(df: DataFrame, partitionCols: Seq[String], order: Seq[Column],
      idCol: String): DataFrame = {
    val w =
      if (partitionCols.isEmpty) Window.orderBy(order: _*)
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    df.withColumn("prev_id", lag(col(idCol), 1).over(w))
      .withColumn("next_id", lead(col(idCol), 1).over(w))
  }

  /** A9/S11-S14 — MERGE latest-wins upsert semantics as a batch operator
    * (JSON sink update_json_data weibo.py:1964-1982; SQLite INSERT OR
    * REPLACE weibo.py:2536-2540): keep the newest row per key. */
  def latestWins(df: DataFrame, keyCols: Seq[String], versionOrder: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(versionOrder: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** SO3 — union by name with null-filled missing columns (retweet-expanded
    * CSV header union, weibo.py:1897-1923). */
  def unionFill(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

  /** §1.1 nested-retweet flatten, variant A (weibo.py:1855-1862): the nested
    * struct becomes prefixed `<prefix><field>` columns plus `is_original`
    * (true when no nested row) — the reference's retweet_* CSV expansion. */
  def flattenStruct(df: DataFrame, structCol: String, prefix: String): DataFrame = {
    val fields = df.schema(structCol).dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    fields.foldLeft(df)((d, f) => d.withColumn(prefix + f, col(s"$structCol.$f")))
      .withColumn("is_original", col(structCol).isNull)
      .drop(structCol)
  }

  /** variant B (weibo.py:2197-2226): normalize the nested struct into a
    * second row + foreign key — parents keep `retweet_id`, each distinct
    * nested row is emitted once (the SQLite INSERT OR REPLACE second-pass,
    * weibo.py:2209-2210). Child rows get null for parent-only columns. */
  def normalizeNested(df: DataFrame, structCol: String, idCol: String): DataFrame = {
    val parents = df.withColumn("retweet_id", col(s"$structCol.$idCol")).drop(structCol)
    val children = df.filter(col(structCol).isNotNull)
      .select(col(s"$structCol.*")).dropDuplicates(idCol)
    unionFill(parents, children)
  }

  /** Gap-based sessionization (the scheduler-interval semantics of
    * service.py:1279-1288 applied to event streams): a new session starts
    * when the gap to the previous event exceeds `gapSeconds`. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String, idCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(idCol).asc)
    df.withColumn("_prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("_new_sess",
        when(col("_prev_ts").isNull, 0L)
          .when(unix_timestamp(col(tsCol)) - unix_timestamp(col("_prev_ts")) > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("_new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_prev_ts", "_new_sess")
  }

  /** integer-cents money helper: exact cross-engine arithmetic for sums of
    * 2-decimal doubles (avoids float association-order drift vs the oracle). */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")
}
