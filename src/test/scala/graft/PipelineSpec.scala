package graft

import graft.operators.QueryPack
import graft.pipeline._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics tests for the training-data pipeline operators (dedup, ANN,
  * text analysis, multimodal) and the read-side query pack. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------- dedup ----------
  val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"), // near dup (1 token)
    (3L, "completely different text about spark engines"),
    (4L, "")).toDF("doc_id", "text")

  test("exact dedup: first occurrence wins") {
    val r = Dedup.exact(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r(0L) == 2L) // keeper 0, two copies
    assert(r(3L) == 1L)
  }

  test("jaccard pairs: dup pair found with exact integer arithmetic") {
    val pairs = Dedup.jaccardPairs(docs, threshold10 = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc0/doc1 identical: inter == union
    assert(pairs.exists { case (a, b, i, u) => a == 0 && b == 1 && i == u })
    // doc0/doc2 share 7 of 9 distinct tokens: 10*7 >= 6*9
    assert(pairs.exists { case (a, b, _, _) => a == 0 && b == 2 })
    assert(!pairs.exists { case (a, b, _, _) => b == 3 || a == 3 })
  }

  test("minhash LSH: identical docs share all bands; disjoint docs none") {
    val pairs = Dedup.minhashLshPairs(docs, numHashes = 12, rowsPerBand = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (a, b, n) => a == 0 && b == 1 && n == 4 })
    assert(!pairs.exists { case (a, b, _) => a == 3 || b == 3 })
  }

  test("simhash: identical docs get identical signatures; near dups close") {
    val sh = Dedup.simhash16(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sh(0L) == sh(1L))
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(2L)) <= 6) // 8/9 tokens shared
    val nd = Dedup.simhashNearDups(docs, maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(nd.contains((0L, 1L, 0L)))
  }

  test("exactByHash matches exact dedup keepers/counts without shuffling text") {
    val byHash = Dedup.exactByHash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val byText = Dedup.exact(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byHash == byText)
  }

  test("jaccard df-cap bounds the candidate blowup on stop-word-heavy corpora") {
    // every doc shares the stop token 'the' — the uncapped inverted index
    // materializes all ~n²/2 pairs (VERDICT r1 scale caveat)
    val stopHeavy = (0L until 60L)
      .map(i => (i, s"the unique$i token$i extra${i % 7}")).toDF("doc_id", "text")
    val uncapped = Dedup.jaccardPairs(stopHeavy, threshold10 = 0).count()
    val capped = Dedup.jaccardPairs(stopHeavy, threshold10 = 0, maxDf = Some(10)).count()
    assert(uncapped == 60L * 59 / 2, s"every pair shares 'the': got $uncapped")
    assert(capped < uncapped / 5, s"df-cap failed to bound candidates: $capped vs $uncapped")
  }

  test("embedNearDups: recovers planted jittered copies; bucket cap bounds hot clusters") {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter($"vec_id" < 100)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("embedding"))
    // plant near-dups: jittered copies (coordinate scale factors in
    // [0.98, 1.02]) of the first 20 vectors — same derivation as q74
    val planted = base.filter($"vec_id" < 20).select(
      ($"vec_id" + 1000L).as("vec_id"),
      transform($"embedding", (x, i) =>
        x * (lit(1.0d) + lit(0.02d) *
          (((($"vec_id" * 31 + i.cast("long")) % 5).cast("double") - lit(2.0d)) / lit(2.0d))))
        .as("embedding"))
    val corpus = base.unionByName(planted)
    val pairs = Dedup.embedNearDups(corpus, minCos = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted copy pairs with exactly its original; the base vectors
    // are mutually near-orthogonal (max pairwise cosine ~0.47) so nothing else
    assert(pairs == (0L until 20L).map(i => (i, i + 1000L)).toSet)

    // hot-bucket cap: 30 identical clones of vector 0 collapse into one
    // oversized bucket per band; maxBucket drops those buckets from
    // candidate generation while ordinary size-2 buckets keep matching
    val clones = spark.range(2000, 2030).toDF("vec_id")
      .crossJoin(base.filter($"vec_id" === 0).select($"embedding"))
    val corpus2 = corpus.unionByName(clones)
    val uncapped = Dedup.embedNearDups(corpus2, minCos = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(uncapped.length >= 30 * 31 / 2, s"clone cluster should explode: ${uncapped.length}")
    val capped = Dedup.embedNearDups(corpus2, minCos = 0.99, maxBucket = Some(5L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists(p => p._1 >= 2000 || p._2 >= 2000), "hot cluster not dropped")
    assert(capped.contains((1L, 1001L)), "cap must not lose cold-bucket pairs")
    assert(capped.size < uncapped.length / 5)
  }

  // ---------- U2: LLM enrichment stage ----------
  test("enrich: batched partition-local client adds a deterministic llm_analysis struct") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Enrich.enrichDf(d).persist()
    assert(out.schema("llm_analysis").dataType
      .isInstanceOf[org.apache.spark.sql.types.StructType])
    // deterministic across runs + partitionings
    val a = out.select($"doc_id", $"llm_analysis.sentiment").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val b = Enrich.enrichDf(d.repartition(7)).select($"doc_id", $"llm_analysis.sentiment")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(a == b, "enrichment depends on partitioning")
    // stub law: sentiment = word-count mod 3
    val bad = out
      .withColumn("wc", size(filter(split($"text", " "), w => w =!= "")))
      .withColumn("want",
        when(pmod($"wc", lit(3)) === 0, "positive")
          .when(pmod($"wc", lit(3)) === 1, "neutral").otherwise("negative"))
      .filter($"llm_analysis.sentiment" =!= $"want").count()
    assert(bad == 0)
    out.unpersist()
  }

  test("simhash pigeonhole bucketing finds every pair a full cross join would (dist<=3)") {
    val bigger = (0L until 64L).map(i => (i, s"tok${i % 7} alpha beta gamma tok${i % 5}")).toDF("doc_id", "text")
    val bucketed = Dedup.simhashNearDups(bigger, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.simhash16(bigger).collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, ha) <- sh; (b, hb) <- sh if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(bucketed == brute)
  }

  test("simhash64: identical sigs for identical docs; pigeonhole == brute force at production width") {
    val sh = Dedup.simhash64(docs.filter($"text" =!= "")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sh(0L) == sh(1L), "identical docs must share the 64-bit signature")
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(3L)) > 10,
      "unrelated docs should be far apart at 64 bits")
    // pigeonhole equivalence at small n (VERDICT r3 item 7 done-criterion)
    val bigger = (0L until 64L)
      .map(i => (i, s"tok${i % 7} alpha beta gamma tok${i % 5}")).toDF("doc_id", "text")
    val all = Dedup.simhash64(bigger).collect().map(r => (r.getLong(0), r.getLong(1)))
    for (d <- Seq(0, 3)) {
      val bucketed = Dedup.simhashNearDups64(bigger, d).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = (for {
        (a, ha) <- all; (b, hb) <- all if a < b
        if java.lang.Long.bitCount(ha ^ hb) <= d
      } yield (a, b)).toSet
      assert(bucketed == brute, s"64-bit pigeonhole diverged from brute force at dist<=$d")
    }
  }

  // ---------- similarity ----------
  test("brute-force cosine top-k ranks an identical vector first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (10L, Array(2.0f, 0.0f, 0.0f)),  // same direction as 0
      (11L, Array(0.9f, 0.1f, 0.0f)),  // close
      (12L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal
      (13L, Array(-1.0f, 0.0f, 0.0f))  // opposite
    ).toDF("vec_id", "embedding")
    val r = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, k = 3)
      .orderBy("rk").collect().map(_.getLong(1)).toSeq
    assert(r == Seq(10L, 11L, 12L))
  }

  test("LSH signature buckets identical-direction vectors together") {
    val vecs = Seq(
      (0L, Array.fill(64)(0.5f)),
      (1L, Array.fill(64)(0.25f)),           // same direction
      (2L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val sigs = Similarity.lshSignature(vecs, bits = 8, dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(2L)) // overwhelmingly likely by construction
  }

  // ---------- text analysis ----------
  test("langId: script and vowel-density branches") {
    val r = Seq((1L, "今天天气不错今天天气"), (2L, "the rain in spain stays mainly"),
        (3L, "zzzz qqqq wwww"), (4L, ""))
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(r(1L) == "zh" && r(2L) == "en" && r(3L) == "other" && r(4L) == "unknown")
  }

  test("quality score components") {
    val good = "the quick brown fox is one of the animals in many stories"
    val bad = "!!! ??? ###"
    val r = Seq((1L, good), (2L, bad)).toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.qualityScore($"text").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r(1L) == 6L)
    assert(r(2L) <= 1L)
  }

  test("token counts") {
    val r = Seq((1L, "hello world 42 foo-bar!")).toDF("doc_id", "text")
      .select(TextAnalysis.wsTokenCount($"text"), TextAnalysis.regexTokenCount($"text"))
      .head()
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == 7L) // hello, world, 42, foo, -, bar, !
  }

  test("fingerprint is normalization-invariant") {
    val r = Seq((1L, "Hello,  World!"), (2L, "hello world")).toDF("doc_id", "text")
      .select(TextAnalysis.fingerprint($"text").as("fp")).collect().map(_.getString(0))
    assert(r(0) == r(1))
  }

  test("rolling hash: equal windows hash equal, position-independent") {
    val h1 = TextAnalysis.rollingHashes("abcdefgh", 4)
    val h2 = TextAnalysis.rollingHashes("xyzabcdefgh", 4)
    assert(h1.length == 5)
    assert(h2.containsSlice(h1)) // shared suffix windows match
    assert(h1.distinct.length == h1.length) // distinct windows distinct (whp)
  }

  // ---------- multimodal ----------
  test("media feature extraction sniffs magic numbers and batches") {
    val media = Seq(
      MediaRow(1L, "image", Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 1, 2, 0xff.toByte, 0xd9.toByte)),
      MediaRow(2L, "image", (Seq(0x89.toByte) ++ "PNG".getBytes.toSeq).toArray),
      MediaRow(3L, "video", "GIF89a".getBytes),
      MediaRow(4L, "audio", Array[Byte](1, 2, 3))).toDS()
    val f = Multimodal.extractFeatures(media, batchSize = 2)
      .collect().map(x => x.media_id -> x).toMap
    assert(f(1L).sniffed_ext == "jpg" && f(2L).sniffed_ext == "png")
    assert(f(3L).sniffed_ext == "gif" && f(4L).sniffed_ext == "bin")
    assert(f(3L).n_frames >= 1 && f(4L).n_frames == 0)
    // deterministic stub: same bytes => same dims
    val again = Multimodal.extractFeatures(media).collect().map(x => x.media_id -> x).toMap
    assert(f(1L).width == again(1L).width && f(1L).height == again(1L).height)
  }

  test("binary sniff expression matches typed sniff") {
    val media = Multimodal.synthMedia(spark, spark.range(100).toDF("k"), "k")
    val viaExpr = media.toDF.withColumn("ext", Multimodal.sniffExt($"bytes"))
      .select("media_id", "ext").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaTyped = Multimodal.extractFeatures(media).collect().map(x => x.media_id -> x.sniffed_ext).toMap
    assert(viaExpr == viaTyped)
    // jpeg completeness holds for synthesized jpegs
    val complete = media.toDF.filter(pmod($"media_id", lit(4)) === 0)
      .filter(!Multimodal.jpegComplete($"bytes")).count()
    assert(complete == 0)
  }

  test("frameSample: even spacing, both branches, payload slices ride the row") {
    val media = Multimodal.synthMedia(spark, spark.range(1000).toDF("k"), "k").toDF()
      .filter($"kind" === "video")
      .withColumn("n_frames", (lit(1L) + pmod($"media_id", lit(240L))).cast("int"))
    val out = Multimodal.frameSample(media, targetFrames = 8).persist()
    val byMedia = out.select($"media_id", $"n_frames", $"frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1)
    byMedia.foreach { case (id, rows) =>
      val n = rows.head._2
      val idxs = rows.map(_._3).sorted
      assert(idxs.length == math.min(8, n), s"media $id: ${idxs.length} frames for n=$n")
      assert(idxs.distinct.length == idxs.length, s"media $id: duplicate frame idx")
      assert(idxs.forall(i => i >= 0 && i < n), s"media $id: idx out of range")
      if (n >= 8) assert(idxs.toSeq == (0 until 8).map(k => k * n / 8), s"media $id spacing")
      else assert(idxs.toSeq == (0 until n), s"media $id short-video branch")
    }
    // both branches actually exercised
    assert(byMedia.exists(_._2.head._2 < 8) && byMedia.exists(_._2.head._2 >= 8))
    // payload: 4-byte slice (or to end-of-blob), non-null for non-empty bytes
    val pay = out.select($"frame_bytes").collect().map(_.getAs[Array[Byte]](0))
    assert(pay.forall(b => b != null && b.length >= 1 && b.length <= 4))
    out.unpersist()
  }

  test("resizePlan: fits the box, never upscales, preserves aspect ordering") {
    val media = spark.range(2000).toDF("media_id")
      .withColumn("width", (lit(16L) + pmod($"media_id" * 7, lit(4096L))).cast("int"))
      .withColumn("height", (lit(16L) + pmod($"media_id" * 13, lit(2160L))).cast("int"))
    val out = Multimodal.resizePlan(media, maxW = 640, maxH = 480)
      .select($"width", $"height", $"out_w", $"out_h")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    out.foreach { case (w, h, ow, oh) =>
      assert(ow >= 1 && oh >= 1 && ow <= 640 && oh <= 480, s"($w,$h)->($ow,$oh) outside box")
      assert(ow <= w && oh <= h, s"($w,$h)->($ow,$oh) upscaled")
      if (w <= 640 && h <= 480) assert(ow == w && oh == h, "pass-through branch")
      else {
        // one side pinned to the box, the other floor-scaled by the same ratio
        assert(ow == 640 || oh == 480, s"($w,$h)->($ow,$oh) neither side pinned")
        if (ow == 640) assert(oh == math.max(1, h.toLong * 640 / w).toInt)
        else assert(ow == math.max(1, w.toLong * 480 / h).toInt)
      }
    }
    assert(out.exists { case (w, h, _, _) => w <= 640 && h <= 480 })   // pass-through
    assert(out.exists { case (w, h, _, _) => w.toLong * 480 >= h.toLong * 640 && (w > 640 || h > 480) })
    assert(out.exists { case (w, h, _, _) => w.toLong * 480 < h.toLong * 640 && (w > 640 || h > 480) })
  }

  // ---------- query pack ----------
  val ev = Seq(
    (1L, "2024-01-01 00:00:00", 7L), (2L, "2024-01-01 00:10:00", 7L),
    (3L, "2024-01-01 01:10:00", 7L), (4L, "2024-01-01 00:05:00", 9L))
    .toDF("event_id", "ts_s", "user_id")
    .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")

  test("sessionize splits on gap > threshold") {
    val r = QueryPack.sessionize(ev, "user_id", "ts", "event_id", 1800)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("session_id"))).toMap
    assert(r(1L) == 0L && r(2L) == 0L && r(3L) == 1L && r(4L) == 0L)
  }

  test("prevNext emits lag/lead ids") {
    val r = QueryPack.prevNext(ev, Seq("user_id"), Seq(col("ts").asc, col("event_id").asc), "event_id")
      .collect().map(r => (r.getLong(0), (Option(r.getAs[java.lang.Long]("prev_id")), Option(r.getAs[java.lang.Long]("next_id"))))).toMap
    assert(r(1L) == (None, Some(2L)))
    assert(r(2L) == (Some(java.lang.Long.valueOf(1)), Some(java.lang.Long.valueOf(3))))
    assert(r(4L) == (None, None))
  }

  test("latestWins keeps newest per key") {
    val r = QueryPack.latestWins(ev, Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("event_id")).toMap
    assert(r(7L) == 3L && r(9L) == 4L)
  }

  test("paginate returns the requested window") {
    val df = spark.range(1, 101).toDF("id")
    val page3 = QueryPack.paginate(df, Seq(col("id").asc), page = 3, pageSize = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(page3 == (21L to 30L))
  }

  // ---------- S15: HTTP POST side-output sink ----------

  test("post sink: batched partition-local delivery, exact roundtrip") {
    val chan = "t_" + java.util.UUID.randomUUID()
    val src = spark.range(0, 500).select($"id", concat(lit("v"), $"id").as("v"))
    val n = PostSink.postJson(src, () => new CapturePostClient(chan),
      batchSize = 64, backoffMs = 0)
    assert(n == 500)
    val posted = CapturePostClient.drain(chan)
    assert(posted.size == 500)
    val back = spark.read.schema("id BIGINT, v STRING").json(posted.toDS)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back.size == 500 && back(7L) == "v7")
  }

  test("post sink: transient failures retried with backoff; payloads delivered once") {
    val chan = "t_" + java.util.UUID.randomUUID()
    val src = spark.range(0, 200).coalesce(2).select($"id")
    // each partition's client fails its first 2 post calls, then succeeds
    val n = PostSink.postJson(src, () => new FlakyPostClient(chan, failures = 2),
      batchSize = 1000, maxRetries = 3, backoffMs = 0)
    assert(n == 200, "retries must re-deliver failed payloads")
    assert(CapturePostClient.drain(chan).size == 200, "no duplicate delivery on retry")
  }

  test("post sink: exhausted retries drop the payload (logged dead-letter, like the reference)") {
    val chan = "t_" + java.util.UUID.randomUUID()
    val src = spark.range(0, 50).coalesce(1).select($"id")
    val n = PostSink.postJson(src, () => new FlakyPostClient(chan, failures = 10),
      batchSize = 1000, maxRetries = 2, backoffMs = 0)
    assert(n == 0 && CapturePostClient.drain(chan).isEmpty)
  }

  // ---------- X12: cookie parse ----------

  test("cookie parse mirrors the reference's SUB-first / full-fallback decision") {
    import graft.functions.ScalarOps._
    val rows = Seq(
      "SUB=abc; _T_WM=tw1; XSRF-TOKEN=x1; other=zz",
      "SUB=", // present-but-empty SUB: reference still takes the core path
      "k1 = v1 ; k2=w2; junk",
      "").toDF("c")
      .select(cookieMode($"c").as("mode"), cookieField($"c", "SUB").as("sub"),
        cookieField($"c", "_T_WM").as("twm"), cookiePairCount($"c").as("n"))
      .collect()
    assert(rows(0).getString(0) == "sub" && rows(0).getString(1) == "abc"
      && rows(0).getString(2) == "tw1" && rows(0).getInt(3) == 4)
    assert(rows(1).getString(0) == "sub" && rows(1).getString(1) == "")
    assert(rows(2).getString(0) == "full" && rows(2).isNullAt(1) && rows(2).getInt(3) == 2)
    assert(rows(3).getString(0) == "empty" && rows(3).getInt(3) == 0)
    // trimmed first-'='-wins pairs
    val pairs = Seq("a = b=c; d=e").toDF("c")
      .select(cookiePairs($"c").as("p")).head.getSeq[org.apache.spark.sql.Row](0)
    assert(pairs.map(r => (r.getString(0), r.getString(1))) == Seq(("a", "b=c"), ("d", "e")))
  }
}

/** IVF ANN: candidate quality vs the exact baseline. */
class IvfSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.pipeline.Similarity

  test("IVF top-k achieves high recall vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(q, emb, k = 5))
    val ivf = pairs(Similarity.ivfTopK(q, emb, k = 5, nCentroids = 16, nprobe = 8))
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(exact.size == 50)
    assert(recall >= 0.5, s"IVF recall too low: $recall") // nprobe=8 of 16 cells
    // identical-direction sanity: the exact nearest is found when probed
    val ivfFull = pairs(Similarity.ivfTopK(q, emb, k = 5, nCentroids = 16, nprobe = 16))
    assert(ivfFull == exact, "probing all cells must equal brute force")
  }

  test("multi-probe LSH lifts recall over the single-bucket probe (VERDICT r3 item 8)") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val bits = 8
    val dims = emb.head.getSeq[Float](emb.columns.indexOf("embedding")).size
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(q, emb, k = 5))
    val single = pairs(Similarity.lshTopK(q, emb, k = 5, bits, dims))
    val multi1 = pairs(Similarity.lshTopKMultiProbe(q, emb, k = 5, bits, dims, probeRadius = 1))
    val multi2 = pairs(Similarity.lshTopKMultiProbe(q, emb, k = 5, bits, dims, probeRadius = 2))
    def recall(s: Set[(Long, Long)]) = (exact intersect s).size.toDouble / exact.size
    // radius 0 must equal the single-bucket probe exactly (same candidates)
    assert(pairs(Similarity.lshTopKMultiProbe(q, emb, k = 5, bits, dims, probeRadius = 0)) == single)
    val (rS, r1p, r2p) = (recall(single), recall(multi1), recall(multi2))
    assert(r1p >= rS, s"radius-1 multi-probe recall $r1p < single-probe $rS")
    assert(r2p >= r1p, s"radius-2 recall $r2p < radius-1 $r1p")
    assert(r2p > rS, s"multi-probe must LIFT recall: single=$rS r1=$r1p r2=$r2p")
  }
}
