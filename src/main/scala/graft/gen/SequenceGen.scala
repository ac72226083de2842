package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.TokenTable

/**
 * Deterministic (seeded) synthetic generator for the pre-tokenized sequence
 * table — the engine's primary fixture (FIXTURES.md §1). Pure SQL functions,
 * no driver-side data: scales to any row count as a single codegen'd
 * projection over `spark.range`.
 *
 * Skew is intentional (BASELINE.json north_rule: "token-length skew handled
 * explicitly"): ~90% short docs (16-512 tokens), ~9% medium (513-4096),
 * ~1% long (4097-16384).
 */
object SequenceGen {

  val sources: Seq[String] = Seq("web", "code", "books", "wiki")

  /** `nDocs` deterministic rows of (doc_id, tokens, n_tok, source). */
  def sequences(spark: SparkSession, nDocs: Long, seed: Long = 42L): DataFrame = {
    val id = col("id")
    val h = abs(xxhash64(id, lit(seed))) // deterministic per (id, seed)
    val u = pmod(h, lit(1000L))
    val nTok = when(u < 900, lit(16) + pmod(h, lit(497)).cast("int"))
      .when(u < 990, lit(513) + pmod(h, lit(3584)).cast("int"))
      .otherwise(lit(4097) + pmod(h, lit(12288)).cast("int"))
    spark.range(nDocs)
      .select(
        format_string("doc%012d", id).as("doc_id"),
        nTok.as("n_tok"),
        pmod(h, lit(sources.size.toLong)).cast("int").as("_src"),
        id)
      .select(
        col("doc_id"),
        // tokens[j] = (id*31 + j) mod 50021 — cheap, reproducible, and
        // verifiable row-by-row by an independent oracle.
        transform(sequence(lit(0), col("n_tok") - 1),
          j => pmod(col("id") * 31 + j, lit(50021)).cast("int")).as("tokens"),
        col("n_tok"),
        element_at(typedLit(sources), col("_src") + 1).as("source"))
  }

  /**
   * Create a token table seeded with `nDocs` rows spread over `nFiles`
   * deliberately small, unclustered files (the compaction fixture: rows are
   * hash-scattered so every file spans the full doc_id range).
   */
  def createTable(
      spark: SparkSession,
      root: String,
      nDocs: Long,
      nFiles: Int,
      seed: Long = 42L): TokenTable = {
    val t = TokenTable.create(spark, root)
    appendScattered(spark, t, nDocs, nFiles, seed)
    t
  }

  def appendScattered(
      spark: SparkSession,
      t: TokenTable,
      nDocs: Long,
      nFiles: Int,
      seed: Long): Unit = {
    val df = sequences(spark, nDocs, seed)
      .repartition(nFiles, xxhash64(col("doc_id"), lit(seed + 1)))
    val files = t.stageWrite(df, s"gen-seed$seed")
    t.commit("append", files, summary = Map("generator-seed" -> seed.toString))
  }
}
