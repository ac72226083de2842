package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/**
 * Training-sequence preparation: the corpus's token stream, concatenated in
 * id order, split into fixed-length training chunks (the "sequence packing"
 * step in an LLM data pipeline — documents rarely align with the context
 * length, so the pipeline must know exactly which documents land in which
 * fixed-length chunk, and where).
 *
 * The hard part at 10^12 docs is the GLOBAL token offset of every document —
 * a prefix sum over the whole corpus. A single-partition window would
 * serialize the job; instead this is the classic distributed scan:
 * range-partition by id, one pass for per-partition token totals (one row
 * per partition — metadata-scale collect), broadcast the partition prefix
 * offsets, one pass writing running offsets. Per-partition imperative
 * cumsum is genuine sequential logic, so it runs via `mapPartitions` — the
 * one place the RDD escape hatch is the right tool.
 */
object SequencePack {

  /**
   * (id, n_tok, tok_offset) with `tok_offset` the exclusive global prefix
   * sum of `n_tok` in ascending `idCol` order. `idCol` must be unique (the
   * total order); offsets are independent of the partition count.
   */
  def globalTokenOffsets(
      docs: DataFrame,
      idCol: String = "doc_id",
      nCol: String = "n_tok",
      numPartitions: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // null counts read as 0 (an absent length must not NPE a task)
    val sorted = docs.select(col(idCol), coalesce(col(nCol).cast("long"), lit(0L)).as("_n"))
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(idCol)
    val rows = runningOffsets(sorted, nIdx = 1).map { case (r, off) =>
      Row(r.get(0), r.getLong(1), off)
    }
    val schema = StructType(sorted.schema.fields.take(1))
      .add("n_tok", LongType, nullable = false)
      .add("tok_offset", LongType, nullable = false)
    spark.createDataFrame(rows, schema)
  }

  /**
   * The distributed two-pass prefix sum shared by sequence packing and
   * token-budget selection: rows of an ALREADY range-partitioned,
   * partition-sorted frame zipped with the running global offset of the
   * long column at `nIdx`. Pass 1 collects per-partition totals (one row
   * per partition — metadata-scale); their exclusive prefix is broadcast as
   * each partition's base for pass 2.
   *
   * ONE `.rdd` translation is shared by both passes: each `.rdd` call would
   * plan its own range exchange, and two independently-sampled partitioners
   * could disagree on boundaries — pass 1's totals would then describe
   * different partitions than pass 2 reads. Sharing the RDD pins one
   * partitioner and lets the second job reuse the first's shuffle output.
   *
   * `mapPartitionsWithIndex`, NOT `TaskContext.getPartitionId()`: the
   * latter is the TASK's id, which collapses to 0 if a caller coalesce()s
   * the result — every partition would then restart its cumsum at base 0.
   * The index argument is the parent split index however tasks are fused.
   */
  private[text] def runningOffsets(
      sorted: DataFrame, nIdx: Int): org.apache.spark.rdd.RDD[(Row, Long)] = {
    val sortedRdd = sorted.rdd
    val totals: Array[(Int, Long)] = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(nIdx))
      Iterator((pid, s))
    }.collect()
    val prefix: Map[Int, Long] = {
      var acc = 0L
      totals.sortBy(_._1).map { case (pid, s) => val p = (pid, acc); acc += s; p }.toMap
    }
    val prefixBc = sorted.sparkSession.sparkContext.broadcast(prefix)
    sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = prefixBc.value.getOrElse(pid, 0L)
      it.map { r =>
        val off = acc
        acc += r.getLong(nIdx)
        (r, off)
      }
    }
  }

  /**
   * Per-document chunk contributions for fixed-length chunks of `maxLen`
   * tokens over the packed stream: a doc at offset o with n tokens spans
   * chunks floor(o/L)..floor((o+n-1)/L), contributing
   * `min(o+n, (c+1)L) - max(o, cL)` tokens to chunk c. Chunk ids use true
   * 64-bit integral division (`div`), NOT float division — `floor(o / L)`
   * computes in double and silently mis-assigns boundaries once offsets
   * cross 2^53 (a trillion-doc corpus at ~10k tokens/doc does). Offsets are
   * non-negative prefix sums, so truncating and flooring division agree.
   */
  def chunkContributions(withOffsets: DataFrame, maxLen: Long): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    val o = col("tok_offset")
    val n = col("n_tok")
    val c = col("chunk_id")
    withOffsets
      .filter(n > 0)
      .select(withOffsets.columns.toIndexedSeq.map(col) :+
        explode(sequence(
          expr(s"tok_offset div ${maxLen}L"),
          expr(s"(tok_offset + n_tok - 1) div ${maxLen}L"))).as("chunk_id"): _*)
      .withColumn("tokens_in_chunk",
        least(o + n, (c + 1) * maxLen) - greatest(o, c * maxLen))
  }

  /** Per-chunk packing stats: documents touching the chunk and its token
    * fill (== maxLen everywhere but the tail chunk). */
  def chunkStats(docs: DataFrame, maxLen: Long,
      idCol: String = "doc_id", nCol: String = "n_tok"): DataFrame =
    chunkContributions(globalTokenOffsets(docs, idCol, nCol), maxLen)
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens_in_chunk")).as("n_tokens"))
}
