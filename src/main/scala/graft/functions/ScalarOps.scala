package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/**
 * Scalar column helpers re-expressing the reference's value-level functions
 * (SURVEY.md §2.7) as pure Catalyst expressions — no UDFs, no wall clock.
 */
object ScalarOps {

  /**
   * X9 — relative-date normalization (/root/reference/weibo.py:1247-1268):
   * 「刚刚」→ anchor; 「N分钟」→ anchor−N min; 「N小时」→ anchor−N h;
   * 「昨天」→ anchor−1 day; otherwise parse as a full timestamp.
   *
   * The reference anchors on datetime.now() — non-deterministic and
   * unreplayable; here the batch anchor is an explicit parameter
   * (SURVEY.md §7 hard-part 4), so identical inputs give identical outputs
   * at any time, on any executor.
   */
  def relativeDate(c: Column, anchor: Column): Column = {
    val minutesBack =
      when(c.contains("刚刚"), lit(0))
        .when(c.contains("分钟"), regexp_extract(c, "^(\\d+)分钟", 1).cast("int"))
        .when(c.contains("小时"), regexp_extract(c, "^(\\d+)小时", 1).cast("int") * 60)
        .when(c.contains("昨天"), lit(1440))
    when(minutesBack.isNotNull,
      anchor - call_function("make_dt_interval", lit(0), lit(0), minutesBack, lit(0)))
      .otherwise(to_timestamp(c, "yyyy-MM-dd HH:mm:ss"))
  }

  /** X16 — parse-coalesce of dates (service.py:450-457, 477-487): first
    * format that parses wins; null if none. Includes the raw weibo locale
    * format the reference actually stores for comments
    * ('Thu Nov 20 11:39:50 +0800 2025', parsed at util/pdf_exporter.py:473-489). */
  def parseCoalesceTs(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss")),
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(c, lit("yyyy-MM-dd")),
      parseWeiboCreatedAt(c))

  /** The raw comment `created_at` locale format
    * ('%a %b %d %H:%M:%S %z %Y' per util/pdf_exporter.py:486) — zone offset
    * applied, result in session time (UTC). Spark's (post-3.0) datetime
    * parser refuses day-of-week fields in PARSE patterns, so the redundant
    * weekday token is dropped (last 5 space-separated fields) before
    * parsing 'MMM dd HH:mm:ss Z yyyy'. */
  def parseWeiboCreatedAt(c: Column): Column =
    try_to_timestamp(substring_index(c, " ", -5), lit("MMM dd HH:mm:ss Z yyyy"))

  /** X2 — comment tag-strip variant (weibo.py:2388-2391): regex tag removal,
    * newline drop, trim (the cheap non-DOM path). */
  def stripTags(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "<[^<]+?>", ""), "\n", ""))

  /** X10 — since/end normalization (weibo.py:286-331). */
  def normalizeEnd(c: Column): Column =
    when(c.rlike("^\\d{4}-\\d{2}-\\d{2}$"), concat(c, lit("T23:59:59"))).otherwise(c)
  def normalizeSince(c: Column): Column =
    when(c.rlike("^\\d{4}-\\d{2}-\\d{2}$"), concat(c, lit("T00:00:00"))).otherwise(c)

  // ------------------------------------------------------------------
  // X12 — cookie parse (weibo.py:343-372, `_apply_cookie_to_session`):
  // prefer the core SUB cookie (plus the _T_WM / XSRF-TOKEN backup
  // fingerprints); when no "SUB=" is present, fall back to loading ALL
  // `k=v` pairs (split on ';', first '=' wins, keys/values trimmed).
  // Pure Catalyst columns — the same naive substring semantics as the
  // reference's re.search over the whole string.
  // ------------------------------------------------------------------

  /** value of one cookie by name — `NAME=(.*?)(;|$)` ≡ `NAME=([^;]*)`;
    * null when the name never occurs. */
  def cookieField(c: Column, name: String): Column = {
    val v = regexp_extract(c, name + "=([^;]*)", 1)
    when(c.contains(name + "="), v)
  }

  /** the reference's three-way mode decision: 'sub' (core SUB extracted),
    * 'full' (non-empty but no SUB ⇒ load all pairs), 'empty'. */
  def cookieMode(c: Column): Column =
    when(c.isNull || c === "", "empty")
      .when(c.contains("SUB="), "sub")
      .otherwise("full")

  /** fallback pair list: array<struct<k,v>> of trimmed `k=v` pairs
    * (pairs without '=' are dropped, weibo.py:369-372). */
  def cookiePairs(c: Column): Column =
    transform(
      filter(split(c, ";"), p => p.contains("=")),
      p => struct(
        trim(substring_index(p, "=", 1)).as("k"),
        trim(p.substr(instr(p, "=") + 1, length(p))).as("v")))

  def cookiePairCount(c: Column): Column = size(cookiePairs(c))

  /** X14 sub-piece — `_truncate_middle` (/root/reference/service.py:72-85):
    * bound a display string to maxLen CHARACTERS by replacing the middle
    * with '...' — head = (maxLen−3)/2 chars, tail the rest; null → "";
    * short strings pass through. Pure columns (length/substring count
    * characters in both Spark and the DuckDB oracle, so multi-byte text
    * truncates identically). */
  def truncateMiddle(c: Column, maxLen: Int): Column = {
    require(maxLen > 3, s"truncateMiddle needs maxLen > 3 (got $maxLen)")
    val keep = maxLen - 3
    val head = keep / 2
    val tail = keep - head
    when(c.isNull, lit(""))
      .when(length(c) <= maxLen, c)
      .otherwise(concat(substring(c, 1, head), lit("..."), substring(c, -tail, tail)))
  }
}
