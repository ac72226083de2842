package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/**
 * Corpus curation operators beyond dedup: deterministic source mixing
 * (stratified sampling) and data selection under a token budget — the two
 * knobs a training-data pipeline turns after cleaning ("how much of each
 * source" and "which documents fill the budget").
 *
 * Both are built scale-first: sampling is a stateless per-row integer-hash
 * predicate (no shuffle, no RNG state, reproducible across engines and
 * retries); budget selection is the distributed prefix-sum shape from
 * [[SequencePack]] over a quality-ranked range partitioning — never a
 * single-partition global window.
 */
object Curation {

  /** Deterministic per-row sampling hash in [0, 10000): a multiplicative
    * hash of the id in portable integer math (id is reduced mod p FIRST so
    * the product stays < 2^62 for any 64-bit id — no overflow at 10^12
    * docs). */
  def sampleBucket(id: Column): Column =
    pmod(pmod(pmod(id, lit(TextOps.HashMod1)) * 2654435761L, lit(TextOps.HashMod1)), lit(10000L))

  /**
   * Stratified sampling / source mixing: keep a deterministic `rates(s)`
   * fraction of each stratum (e.g. source or language), `defaultRate` for
   * strata not named. The keep decision is a pure function of the id — no
   * RNG, no state, so retried tasks, different partitionings and an
   * independent SQL engine all select the SAME rows.
   */
  def stratifiedSample(
      docs: DataFrame,
      rates: Map[String, Double],
      defaultRate: Double,
      stratumCol: String,
      idCol: String = "doc_id"): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      "sampling rates must be in [0, 1]")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    docs.filter(sampleBucket(col(idCol)) < (rate * 10000.0).cast("long"))
  }

  /**
   * Greedy data selection under a token budget: rank documents by
   * (`scoreCol` desc, `idCol`) and keep the maximal prefix of whole
   * documents whose token counts fit in `budget`. The global running total
   * over the ranked order is the [[SequencePack]] two-pass distributed scan
   * — range-partition by rank key, per-partition totals (one metadata-scale
   * collect), broadcast prefix bases, partition-local cumsum — so no stage
   * ever sees more than its partition. Returns (idCol, n) for the selected
   * documents.
   *
   * (Like every range partitioning, the rank key is sampled by the
   * exchange, which re-executes the scored input once; pass a cached input
   * if the score is expensive.)
   */
  def selectUnderBudget(
      docs: DataFrame,
      budget: Long,
      scoreCol: String,
      nCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = docs
      .select(col(idCol), col(scoreCol).as("_score"),
        coalesce(col(nCol).cast("long"), lit(0L)).as("_n"))
      .repartitionByRange(parts, col("_score").desc, col(idCol))
      .sortWithinPartitions(col("_score").desc, col(idCol))
    // shared two-pass distributed prefix sum (single pinned partitioner,
    // coalesce-safe partition ids — see SequencePack.runningOffsets)
    val rows = graft.text.SequencePack.runningOffsets(sorted, nIdx = 2).flatMap {
      case (r, off) =>
        val n = r.getLong(2)
        // whole-document greedy fill: a doc is in iff it fits entirely
        if (n > 0 && off + n <= budget) Some(Row(r.get(0), n)) else None
    }
    val schema = StructType(sorted.schema.fields.take(1)).add("n", LongType, nullable = false)
    spark.createDataFrame(rows, schema)
  }
}
