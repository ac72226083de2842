package graft

import org.apache.spark.sql.functions._

import graft.text.AnnOps

/** ANN quality: the IVF scale path must recover most of the exact
  * brute-force neighbors while scoring only a fraction of the corpus. */
class AnnSpec extends SparkSpec {

  test("ivf top-k recall vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val k = 10

    def neighbors(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getLong(0)).map { case (q, rows) =>
        q -> rows.map(_.getLong(1)).toSet
      }

    val exact = neighbors(AnnOps.bruteForceTopK(emb, queries, k))
    val ivf = neighbors(AnnOps.ivfTopK(emb, queries, k, nCells = 16, nProbe = 6))

    val recalls = exact.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"IVF mean recall@$k too low: $mean")

    // and it must actually prune: candidate set well below full corpus
    val total = emb.count()
    val probed = AnnOps.ivfTopK(emb, queries, k = total.toInt, nCells = 16, nProbe = 6)
      .groupBy("query_id").count().agg(max("count")).collect()(0).getLong(0)
    assert(probed < total, s"IVF probed the whole corpus ($probed of $total)")
  }
}
