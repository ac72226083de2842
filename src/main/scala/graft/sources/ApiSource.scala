package graft.sources

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/**
 * SimpleApiExtractor recast (reference nodestream/pipeline/extractors/
 * apis.py): paged API extraction whose fetch runs INSIDE tasks, sharded by a
 * caller-supplied key list — the scalable shape: a driver-side fetch loop
 * caps throughput at one connection, while 1000 executors pull 1000 shards
 * concurrently, each shard paging independently. The fetch function receives
 * its shard id and returns that shard's records (paging loop inside);
 * failures follow Spark task retry, so a flaky shard re-pulls only itself.
 */
object ApiSource {

  def fetchSharded[T: Encoder](
      spark: SparkSession,
      shards: Seq[String],
      fetch: String => Iterator[T]): Dataset[T] = {
    import spark.implicits._
    val parallelism = math.max(1, math.min(shards.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(shards)
      .repartition(parallelism)
      .mapPartitions(_.flatMap(fetch))
  }
}
