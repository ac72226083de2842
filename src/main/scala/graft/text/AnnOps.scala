package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`). Brute-force cosine top-k is the exact baseline; the
 * scale path buckets vectors with deterministic random-hyperplane LSH so the
 * per-query candidate set is a tiny fraction of the corpus (at 10^12 rows the
 * brute force is a full scan per query; the LSH variant prunes to one bucket
 * chain). All math is `functions._` column algebra — codegen'd, no UDFs.
 */
object AnnOps {

  /** Dot product of two float-array columns (computed in double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Exact brute-force top-k by cosine: broadcast the (small) query set,
   * cross-score against the corpus, window-rank per query. One shuffle
   * (rank), no driver collection.
   */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a fixed integer hash mapped to [-1, 1]. */
  private def planeComponent(p: Int, i: Column): Column =
    (pmod(xxhash64(lit(p), i), lit(2000001L)).cast("double") - 1000000.0) / 1000000.0

  /** `planes`-bit random-hyperplane LSH signature of a vector column. */
  def lshSignature(vec: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))

  /**
   * LSH-bucketed ANN: signature-equality join prunes candidates to one
   * bucket, then exact cosine ranks within it. Recall < 1 by construction;
   * `planes` trades bucket size against recall.
   */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      planes: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      lshSignature(col(vecCol), planes).as("sig"))
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      lshSignature(col(vecCol), planes).as("sig")))
    val scored = c.join(q, Seq("sig")).filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Cosine near-duplicate pairs via LSH blocking + exact verify. */
  def cosineNearDupPairs(
      corpus: DataFrame,
      threshold: Double,
      planes: Int = 6,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val sigs = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshSignature(col(vecCol), planes).as("sig"))
    val a = sigs.toDF("id_a", "v_a", "sig")
    val b = sigs.toDF("id_b", "v_b", "sig")
    a.join(b, Seq("sig")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cosine(col("v_a"), col("v_b")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
