package graft.maintenance

import graft.table.{DataFileMeta, TableJson, TokenTable}

/**
 * Per-step work-unit ledger enabling crash resume without recomputing
 * committed work — the Spark-native recast of nodestream's extractor
 * checkpoints (reference nodestream/pipeline/extractors/extractor.py:19-51:
 * checkpoint every N records, resume on start, clear on clean finish).
 *
 * A maintenance step splits its work into units (chunks of files). After a
 * unit's output is fully staged, its file metas are recorded here
 * (write-temp + atomic rename). A re-run with the same deterministic stepId
 * skips recorded units and reuses their staged outputs; the ledger is
 * cleared after the final snapshot commit.
 */
final class Ledger(table: TokenTable, stepId: String) {
  // All blobs go through the table's checkpoint ObjectStore — HMAC-signed
  // when the table declares `checkpoint.hmac-key-base64` (the reference's
  // SignedObjectStore contract): a tampered ledger unit fails verification
  // on resume instead of silently steering which work is skipped.
  private val store = ObjectStore.forTable(table)
  private val prefix = s"ledger/$stepId"

  def completedUnits(): Map[String, Seq[DataFileMeta]] =
    store.list(prefix)
      .filter(_.endsWith(".json"))
      .flatMap { key =>
        // a unit deleted between list and get (concurrent clear) is simply
        // absent — never fabricated as an empty completed unit
        store.get(key).map { bytes =>
          key.split('/').last.stripSuffix(".json") ->
            TableJson.readManifest(new String(bytes, "UTF-8"))
        }
      }.toMap

  def record(unitId: String, files: Seq[DataFileMeta]): Unit =
    store.put(s"$prefix/$unitId.json", TableJson.write(files).getBytes("UTF-8"))

  def clear(): Unit = store.deleteAll(prefix)
}
