package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Text-analysis stages for training-data pipelines: language ID, quality
 * scoring, token counting, document fingerprinting. All pure column
 * expressions (codegen'd, no UDFs) with exact integer arithmetic where a
 * cross-engine oracle compares results.
 */
object TextAnalysis {

  /** Character-class language ID heuristic: script detection first (CJK /
    * Cyrillic), then vowel-density for latin text. Integer-exact (length
    * comparisons — no float thresholds). N-gram profile models slot in here
    * at scale; the pipeline shape (one projection) is identical. */
  def langId(text: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))
    val cyr = length(regexp_replace(text, "[^\\x{0400}-\\x{04ff}]", ""))
    val vowels = length(regexp_replace(lower(text), "[^aeiou]", ""))
    val total = length(text)
    when(total === 0, "unknown")
      .when(cjk * 10 >= total, "zh")
      .when(cyr * 10 >= total, "ru")
      .when(vowels * 4 >= total, "en")
      .otherwise("other")
  }

  /** whitespace token count (empty string counts 1 — split semantics are
    * identical in Spark and DuckDB, asserted by the oracle). */
  def wsTokenCount(text: Column): Column = size(split(trim(text), "\\s+")).cast("long")

  /** BPE-ish regex token count: letter runs | digit runs | single
    * non-alnum-non-space chars. */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])")).cast("long")

  private val stopwords = Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "for")

  /** Integer quality score 0..6 (length band + stopword presence + low punct
    * + sane avg word length) — the length/punct/stopword-ratio heuristics of
    * web-text quality filters, integer-exact for the oracle. */
  def qualityScore(text: Column): Column = {
    val len = length(text)
    val words = Dedup.tokens(text)
    val wcount = size(words).cast("long")
    val totWordLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
    val stopCount = size(filter(words, w => w.isin(stopwords.map(_.asInstanceOf[Any]): _*))).cast("long")
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s\\x{4e00}-\\x{9fff}]", ""))
    (when(len.between(20, 10000), 2L).otherwise(0L)
      + when(stopCount >= 2, 2L).otherwise(0L)
      + when(punct * 10 < len, 1L).otherwise(0L)
      + when(wcount > 0 && totWordLen >= wcount * 2 && totWordLen <= wcount * 12, 1L).otherwise(0L))
      .cast("long")
  }

  /** Normalized-content fingerprint: md5 of (lowercased, punctuation-
    * stripped, whitespace-collapsed) text — the cheap cross-engine document
    * identity for exact-dup detection after formatting noise. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s\\x{4e00}-\\x{9fff}]", ""), "\\s+", " ")))

  /** Rabin-Karp rolling hash over the normalized text (polynomial, base 257
    * mod 2^61-1) — the windowed-fingerprint primitive for shingle-level
    * near-dup at scale. Pure Scala (no SQL oracle; covered by unit tests). */
  def rollingHashes(s: String, window: Int): Seq[Long] = {
    val Mod = (1L << 61) - 1
    val Base = 257L
    def mulmod(a: Long, b: Long): Long = {
      // 128-bit multiply mod 2^61-1 via Math.multiplyHigh
      val hi = Math.multiplyHigh(a, b)
      val lo = a * b
      // (hi * 2^64 + lo) mod (2^61 - 1): 2^64 ≡ 8 (mod 2^61-1)
      val r = ((hi % Mod) * 8 % Mod + (lo & Mod) % Mod + (lo >>> 61)) % Mod
      r
    }
    if (s.length < window) return Nil
    var pow = 1L
    (1 until window).foreach(_ => pow = mulmod(pow, Base))
    var h = 0L
    (0 until window).foreach(i => h = (mulmod(h, Base) + s.charAt(i)) % Mod)
    val out = Seq.newBuilder[Long]
    out += h
    (window until s.length).foreach { i =>
      h = (h - mulmod(s.charAt(i - window), pow) % Mod + Mod) % Mod
      h = (mulmod(h, Base) + s.charAt(i)) % Mod
      out += h
    }
    out.result()
  }
}
