package graft.maintenance

import org.apache.hadoop.fs.Path

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
  private val fs = table.fs
  private val dir = new Path(table.metadataDir, s"ledger/$stepId")

  def completedUnits(): Map[String, Seq[DataFileMeta]] = {
    if (!fs.exists(dir)) return Map.empty
    fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".json"))
      .map { st =>
        val unit = st.getPath.getName.stripSuffix(".json")
        unit -> TableJson.readManifest(TokenTable.readString(fs, st.getPath))
      }.toMap
  }

  def record(unitId: String, files: Seq[DataFileMeta]): Unit = {
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".$unitId.tmp")
    TokenTable.writeString(fs, tmp, TableJson.write(files), overwrite = true)
    val dst = new Path(dir, s"$unitId.json")
    if (fs.exists(dst)) fs.delete(dst, false)
    require(fs.rename(tmp, dst), s"ledger record failed for $unitId")
  }

  def clear(): Unit = if (fs.exists(dir)) fs.delete(dir, true)
}
