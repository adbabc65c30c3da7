package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Document deduplication for training-data pipelines, at 100 TB design
 * points:
 *
 *  - exact: one hash-shuffle on the full text (groupBy text) — at scale,
 *    group on xxhash64(text) first so the shuffle carries 8-byte keys, and
 *    resolve the (astronomically rare) hash collision by exact compare
 *    within group;
 *  - token-Jaccard / MinHash-LSH: shingle → signature → band-bucket join.
 *    The LSH band join is THE scale path: candidate pairs come from equality
 *    joins on (band, signature) — a shuffle keyed by tiny band signatures —
 *    never from an O(n²) cross join;
 *  - SimHash: per-doc 16-bit signature (demo width; production uses 64) via
 *    bitwise majority over token hashes — one groupBy, no joins; near-dup
 *    pairs by hamming distance over bucketed prefixes;
 *  - embedding cosine: [[embedNearDups]] — banded random-hyperplane LSH
 *    candidates (equality join on per-band signatures), exact-cosine verify;
 *    the query-side ANN variants live in Similarity.
 *
 * Everything is expressed with codegen'd built-ins (split/explode/md5/agg) —
 * no UDFs — so whole-stage codegen covers the hot paths. md5 is used as the
 * portable uniform hash because every engine agrees on its bytes (the
 * correctness oracle re-computes signatures independently in DuckDB).
 */
object Dedup {

  /** split into non-empty whitespace tokens. */
  def tokens(text: Column): Column = filter(split(text, " "), w => w =!= "")

  /** Exact dedup: keeper = min(doc_id) per identical text (first-wins, the
    * reference's PK-replace semantics weibo.py:2536-2540). */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))
      .select(col("keeper_id"), col("dup_count"), col(textCol))

  /** Exact dedup at scale: group on xxhash64(text) so the shuffle carries an
    * 8-byte key + id per row instead of the full document body — the variant
    * [[exact]]'s scale note promises. Output drops the text entirely (the
    * usual ask: keeper ids + dup counts), which is what makes the hash
    * grouping a real win. xxhash64 collisions (~n²/2^65) would merge two
    * distinct texts; pipelines that can't tolerate that verify keeper groups
    * with one extra semi-join on text. */
  def exactByHash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), xxhash64(col(textCol)).as("h"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("dup_count"))
      .select(col("keeper_id"), col("dup_count"))

  /** distinct (doc, token) pairs. */
  private def tokenized(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("w")).distinct()

  /** Token-level Jaccard candidate pairs with jaccard >= threshold, computed
    * in EXACT integer arithmetic: 10·|∩| >= t10·|∪| (no float drift vs the
    * oracle). Inverted-index self-join — pairs only materialize for docs
    * sharing at least one token.
    *
    * `maxDf` is the scale guard: a stop-word-grade token with document
    * frequency d contributes a d² posting-list blowup to the self-join. With
    * a cap, tokens with df > maxDf are dropped from the token sets first
    * (the CCNet-style discriminative-token restriction: jaccard is then
    * measured over rare tokens only — high-df tokens carry no dedup signal
    * anyway), bounding the join at maxDf² per token. The dropped-token set is
    * tiny by definition and broadcasts. None = exact semantics (the oracle
    * path); at 100 TB always set a cap or use [[minhashLshPairs]]. */
  def jaccardPairs(docs: DataFrame, threshold10: Int,
      idCol: String = "doc_id", textCol: String = "text",
      maxDf: Option[Long] = None): DataFrame = {
    val tokAll = tokenized(docs, idCol, textCol)
    val tok = maxDf match {
      case Some(cap) =>
        val hot = tokAll.groupBy(col("w")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("w")
        tokAll.join(broadcast(hot), Seq("w"), "left_anti")
      case None => tokAll
    }
    val sizes = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = tok.as("a").join(tok.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sa"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sb"), "doc_b")
      .withColumn("union_size", col("sa") + col("sb") - col("inter"))
      .filter(lit(10) * col("inter") >= lit(threshold10) * col("union_size"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("union_size"))
  }


  /** word-bigram shingles (n-gram jaccard / minhash unit). */
  def bigramShingles(text: Column): Column = {
    val ws = tokens(text)
    zip_with(slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
      slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
  }

  /**
   * MinHash signatures: numHashes portable min-hashes h_i(doc) =
   * min over shingles of md5('i:' || shingle) — lexicographic min of a
   * uniform hex hash is a valid permutation-min proxy, and both engines
   * agree on md5 bytes. Banded for LSH: rowsPerBand hashes concatenated
   * (zero-padded index keeps lexicographic == numeric order).
   */
  def minhashBands(docs: DataFrame, numHashes: Int, rowsPerBand: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"), explode(bigramShingles(col(textCol))).as("sh"))
      .distinct()
    val minhashes = sh
      .select(col("doc_id"), explode(sequence(lit(0), lit(numHashes - 1))).as("i"), col("sh"))
      .groupBy(col("doc_id"), col("i"))
      .agg(min(md5(concat(col("i").cast("string"), lit(":"), col("sh")))).as("mh"))
    minhashes
      .withColumn("band", (col("i") / rowsPerBand).cast("long"))
      .groupBy(col("doc_id"), col("band"))
      .agg(concat_ws("|",
        sort_array(collect_list(concat(lpad(col("i").cast("string"), 2, "0"), lit("="), col("mh")))))
        .as("band_sig"))
  }

  /** LSH candidate pairs: docs sharing >= 1 band signature. The join key is
    * (band, band_sig) — equality, shuffle-friendly, skew handled by AQE. */
  def minhashLshPairs(docs: DataFrame, numHashes: Int = 12, rowsPerBand: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bands = minhashBands(docs, numHashes, rowsPerBand, idCol, textCol)
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_sig") === col("b.band_sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_bands"))
  }

  /**
   * 16-bit SimHash (production: 64-bit; 16 keeps the oracle SQL tractable):
   * token bit j comes from nibble j/4 of md5(w) (bit j%4); signature bit =
   * sign of the ±1 majority over all token occurrences; ties → 0.
   */
  def simhash16(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("w"))
      .withColumn("h4", substring(md5(col("w")), 1, 4))
      .select(col("doc_id"), col("h4"), explode(sequence(lit(0), lit(15))).as("j"))
      .withColumn("nib",
        expr("instr('0123456789abcdef', substring(h4, cast(j/4 as int) + 1, 1)) - 1"))
      .withColumn("bit", expr("shiftright(nib, cast(j % 4 as int)) & 1"))
      .withColumn("contrib", when(col("bit") === 1, 1L).otherwise(-1L))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(col("contrib")).as("s"))
      .withColumn("bitval", when(col("s") > 0, expr("shiftleft(1L, cast(j as int))")).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(sum(col("bitval")).as("simhash"))
  }

  /**
   * Production-width 64-bit SimHash (VERDICT r3 item 7; the 16-bit variant
   * stays as the DuckDB-oracle surface): token bit j = bit j of
   * xxhash64(token) — one codegen'd hash per token, no md5 nibble games —
   * signature bit = sign of the ±1 majority, ties → 0. The per-bit majority
   * explodes (doc, token) × 64 — a linear 64× row blowup that partial
   * aggregation collapses map-side (sum per (doc_id, j) combines before the
   * shuffle), so the shuffle carries ≤ 64 rows per doc. bit_or assembles the
   * signature (distinct powers of two; bit 63 would overflow an ANSI sum).
   */
  def simhash64(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("w"))
      .withColumn("h", xxhash64(col("w")))
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(63))).as("j"))
      .withColumn("bit", expr("shiftright(h, cast(j as int)) & 1"))
      .withColumn("contrib", when(col("bit") === 1, 1L).otherwise(-1L))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(col("contrib")).as("s"))
      .withColumn("bitval", when(col("s") > 0, expr("shiftleft(1L, cast(j as int))")).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(bit_or(col("bitval")).as("simhash"))

  /** Near-dup pairs over [[simhash64]] signatures, same pigeonhole shape as
    * [[simhashNearDups]] at production width: maxDist+1 chunks of 64/(d+1)
    * bits ⇒ any pair within hamming maxDist shares ≥ 1 equal chunk, so
    * candidates come from equality joins on (chunk index, chunk value) —
    * never an O(n²) cross join — then hamming verifies exactly. */
  def simhashNearDups64(docs: DataFrame, maxDist: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxDist >= 0 && maxDist < 64, s"maxDist $maxDist out of range")
    val nChunks = maxDist + 1
    val width = 64 / nChunks // last chunk absorbs the remainder bits
    val sh = simhash64(docs, idCol, textCol)
    val chunked = sh.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(nChunks - 1))).as("c"))
      .withColumn("chunk",
        when(col("c") === nChunks - 1,
          expr(s"shiftrightunsigned(simhash, ${(nChunks - 1) * width})"))
          .otherwise(expr(
            s"shiftrightunsigned(simhash, cast(c * $width as int)) & ${(1L << width) - 1}")))
    chunked.as("a").join(chunked.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)").cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /**
   * Embedding-cosine near-duplicate pairs — the vector-space member of the
   * dedup family (exact / jaccard / minhash / simhash / THIS): all pairs
   * with round(cosine, 6) >= minCos, candidates from banded random-hyperplane
   * LSH (Similarity.hyperplane planes, shared with the ANN oracles).
   *
   * Scale shape: each vector contributes `bands` rows of
   * (band, bandSig, id) — an 8-byte-key explode, the vector itself never
   * rides it — candidates come from an equality self-join on
   * (band, bandSig) with id< ordering + pair-distinct, and only the
   * surviving candidate pairs join back to fetch the two vectors for the
   * exact cosine verify. Never an O(n²) cross join. Recall is tuned by
   * bands × bitsPerBand exactly like MinHash-LSH banding: a near-parallel
   * pair disagrees on a band bit only when that hyperplane's margin is
   * tiny, so P(all bands differ) vanishes as cosine → 1.
   *
   * Band signatures are built per band (bitsPerBand ≤ 62 each) rather than
   * as one 64-bit word — bit 63 of a packed word would need bit_or assembly
   * on the Spark side and overflows DuckDB's BIGINT << in the oracle (the
   * same trap [[simhash64]] documents).
   *
   * `maxBucket` is the skew guard, like [[jaccardPairs]]'s maxDf: a
   * degenerate bucket with d members contributes d² candidate pairs; with a
   * cap, buckets larger than maxBucket are dropped from candidate
   * generation (a vector pair colliding ONLY in hot buckets is lost —
   * document the recall trade). None = exact banding semantics (the oracle
   * path); at 100 TB set a cap.
   */
  def embedNearDups(corpus: DataFrame, minCos: Double, bands: Int = 8,
      bitsPerBand: Int = 8, dims: Int = 64, maxBucket: Option[Long] = None,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 62,
      s"bands=$bands bitsPerBand=$bitsPerBand out of range")
    val planes = Similarity.hyperplane(bands * bitsPerBand, dims)
    val vecD = transform(col(vecCol), x => x.cast("double"))
    // per-band signature: sign bits of the band's hyperplane dots, packed
    // little-endian into a long; round(dot, 6) is the cross-engine parity
    // class every ANN oracle uses
    val bandStructs = (0 until bands).map { b =>
      val sig = (0 until bitsPerBand).map { j =>
        val plane = array(planes(b * bitsPerBand + j).map(lit): _*)
        when(round(Similarity.dot(vecD, plane), 6) > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(b).as("band"), sig.as("bsig"))
    }
    val bandedAll = corpus
      .select(col(idCol).as("id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.bsig").as("bsig"))
    val banded = maxBucket match {
      case Some(cap) =>
        val hot = bandedAll.groupBy(col("band"), col("bsig"))
          .agg(count(lit(1)).as("n")).filter(col("n") > cap)
          .select(col("band"), col("bsig"))
        bandedAll.join(broadcast(hot), Seq("band", "bsig"), "left_anti")
      case None => bandedAll
    }
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val vecs = corpus.select(col(idCol).as("vid"), vecD.as("v"))
    cands
      .join(vecs.select(col("vid").as("id_a"), col("v").as("va")), Seq("id_a"))
      .join(vecs.select(col("vid").as("id_b"), col("v").as("vb")), Seq("id_b"))
      .withColumn("cos_r", round(Similarity.cosine(col("va"), col("vb")), 6))
      .filter(col("cos_r") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos_r"))
  }

  /** Near-dup pairs by simhash hamming distance <= maxDist. Demo: full
    * self-join (fine at test scale). Scale path: bucket on signature bytes
    * (pigeonhole: dist<=3 over 4 chunks ⇒ one chunk equal) so candidates come
    * from equality joins on chunks, then verify hamming exactly. */
  def simhashNearDups(docs: DataFrame, maxDist: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = simhash16(docs, idCol, textCol)
    // pigeonhole bucketing: 4 chunks of 4 bits; dist<=3 ⇒ >=1 equal chunk
    val chunked = sh.select(col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("chunk", expr("shiftright(simhash, cast(c * 4 as int)) & 15"))
    chunked.as("a").join(chunked.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)").cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
