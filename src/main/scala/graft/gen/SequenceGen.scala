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

  /** Slim per-doc metadata (doc_id, n_tok, source, _gid) — the token payload
    * is NOT materialized, so shuffles over this frame move ~40 bytes/row
    * instead of the multi-KB token arrays (optimization-guide §8: decide and
    * place with lightweight proxies, materialize heavy payloads after the
    * exchange). `_gid` carries the numeric id [[withTokens]] derives from. */
  private def sequencesSlim(spark: SparkSession, nDocs: Long, seed: Long): DataFrame = {
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
        element_at(typedLit(sources), pmod(h, lit(sources.size.toLong)).cast("int") + 1)
          .as("source"),
        id.as("_gid"))
  }

  /** Materialize the deterministic token stream for a slim frame:
    * tokens[j] = (_gid*31 + j) mod 50021 — cheap, reproducible, and
    * verifiable row-by-row by an independent oracle. */
  private def withTokens(slim: DataFrame): DataFrame =
    slim.select(
      col("doc_id"),
      transform(sequence(lit(0), col("n_tok") - 1),
        j => pmod(col("_gid") * 31 + j, lit(50021)).cast("int")).as("tokens"),
      col("n_tok"),
      col("source"))

  /** `nDocs` deterministic rows of (doc_id, tokens, n_tok, source). */
  def sequences(spark: SparkSession, nDocs: Long, seed: Long = 42L): DataFrame =
    withTokens(sequencesSlim(spark, nDocs, seed))

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
    // Scatter the SLIM rows, then materialize tokens post-shuffle: the
    // exchange moves ~40 B/row instead of the multi-KB token arrays, and the
    // file assignment (hash of doc_id) is byte-identical either way.
    val df = withTokens(sequencesSlim(spark, nDocs, seed)
      .repartition(nFiles, xxhash64(col("doc_id"), lit(seed + 1))))
    val files = t.stageWrite(df, s"gen-seed$seed")
    t.commit("append", files, summary = Map("generator-seed" -> seed.toString))
  }
}
