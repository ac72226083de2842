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

  test("int8 quantization: codes bounded, per-element reconstruction error <= scale/2") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val s = AnnOps.int8Scale(col("embedding"))
    val q = AnnOps.quantizeInt8(col("embedding"))
    val recon = AnnOps.dequantizeInt8(q, s)
    val checked = emb.select(
      array_max(transform(q, x => abs(x))).as("qmax"),
      // worst |x - q*scale| relative to scale/2 (plus float slack)
      array_max(zip_with(col("embedding"), recon,
        (x, r) => abs(x.cast("double") - r))).as("err"),
      s.as("scale"))
    val bad = checked.filter(col("qmax") > 127 ||
      col("err") > col("scale") * 0.5 + 1e-9).count()
    assert(bad == 0)
  }

  test("sequence packing: offsets are an exact prefix sum, chunks fill to maxLen") {
    import graft.text.SequencePack
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val off = SequencePack.globalTokenOffsets(docs, "doc_id", "n_chars", numPartitions = 7)
      .orderBy("doc_id").collect()
    var expect = 0L
    off.foreach { r =>
      assert(r.getLong(2) == expect, s"offset mismatch at ${r.get(0)}")
      expect += r.getLong(1)
    }
    val stats = SequencePack.chunkStats(docs, maxLen = 1000, nCol = "n_chars")
      .orderBy("chunk_id").collect()
    val total = docs.agg(sum(col("n_chars").cast("long"))).collect()(0).getLong(0)
    assert(stats.map(_.getLong(2)).sum == total) // every token lands somewhere
    stats.dropRight(1).foreach(r => assert(r.getLong(2) == 1000L,
      s"non-tail chunk ${r.getLong(0)} not full: ${r.getLong(2)}"))
    assert(stats.map(_.getLong(0)).toSeq == (0L until stats.length).toSeq) // dense ids
  }
}
