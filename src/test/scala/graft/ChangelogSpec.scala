package graft

import org.apache.spark.sql.functions._

import graft.gen.SequenceGen
import graft.maintenance.Maintenance
import graft.table.Changelog

class ChangelogSpec extends SparkSpec {

  private def mk(n: Int = 600, files: Int = 4) =
    SequenceGen.createTable(spark, tmpDir("cdc") + "/tbl", n, files)

  private def types(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.groupBy(Changelog.ChangeTypeCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("empty range and noop rewrites produce no changes") {
    val t = mk()
    val s0 = t.metadata.currentSnapshotId.get
    assert(Changelog.changesBetween(spark, t, Some(s0)).count() == 0)
    // compact + zorder rewrite every byte but change no visible row
    Maintenance.compact(spark, t, targetFileBytes = 64L * 1024 * 1024,
      smallFileThreshold = Some(64L * 1024 * 1024))
    Maintenance.cluster(spark, t, graft.maintenance.ZOrder(Seq("doc_id", "source")))
    assert(Changelog.changesBetween(spark, t, Some(s0)).count() == 0)
  }

  test("from = None means from-empty: every visible row is an insert") {
    val t = mk(300, 2)
    val ch = Changelog.changesBetween(spark, t, None)
    assert(types(ch) == Map("insert" -> 300L))
    assert(ch.count() == t.scan(spark).count())
  }

  test("append-only range takes the manifest fast path (no join) and is exact") {
    val t = mk(400, 3)
    val s0 = t.metadata.currentSnapshotId.get
    val batch = t.scan(spark).limit(50)
      .select(concat(lit("new-"), col("doc_id")).as("doc_id"),
        col("tokens"), col("n_tok"), col("source"))
      .localCheckpoint()
    t.commit("append", t.stageWrite(batch, "a1"))
    t.commit("append", t.stageWrite(batch.withColumn(
      "doc_id", concat(lit("x"), col("doc_id"))), "a2"))
    val ch = Changelog.changesBetween(spark, t, Some(s0))
    assert(ch.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "append-only range must not plan a join")
    assert(types(ch) == Map("insert" -> 100L))
  }

  test("CoW merge surfaces updates as delete+insert pairs, net of rewrites") {
    val t = mk(700, 5)
    val s0 = t.metadata.currentSnapshotId.get
    val upd = t.scan(spark).limit(40)
      .select(col("doc_id"), col("tokens"), (col("n_tok") + 1).as("n_tok"),
        lit("updated").as("source")).localCheckpoint()
    // a real update must change content; n_tok+1 with same tokens does
    Maintenance.mergeInto(spark, t, upd.select(
      col("doc_id"), concat(col("tokens"), array(lit(7))).as("tokens"),
      col("n_tok"), col("source")))
    val ch = Changelog.changesBetween(spark, t, Some(s0))
    assert(types(ch) == Map("delete" -> 40L, "insert" -> 40L))
    val ins = ch.filter(col(Changelog.ChangeTypeCol) === "insert")
    assert(ins.filter(col("source") === "updated").count() == 40)
  }

  test("MoR delete keys in range force the diff path and report deletes") {
    val t = mk(500, 4)
    val s0 = t.metadata.currentSnapshotId.get
    val victims = t.scan(spark).select("doc_id").orderBy("doc_id").limit(3)
      .collect().map(_.getString(0))
    Maintenance.deleteWhereMor(spark, t,
      Maintenance.DocIdBetween(victims.min, victims.max))
    val ch = Changelog.changesBetween(spark, t, Some(s0))
    assert(types(ch) == Map("delete" -> 3L))
    assert(ch.select("doc_id").collect().map(_.getString(0)).sorted.toSeq ==
      victims.sorted.toSeq)
  }

  test("add-column mid-range keeps CDC continuity: diff in the current schema") {
    val t = mk(300, 3)
    val s0 = t.metadata.currentSnapshotId.get
    t.evolveSchema(Seq(graft.table.AddColumn("quality", "DOUBLE")))
    // CoW-update 20 rows under the evolved schema (forces the content-diff
    // path); the 280 untouched rows read quality=null from BOTH snapshots'
    // files via field-id projection, so they hash equal and stay silent
    val upd = t.scan(spark).limit(20)
      .select(col("doc_id"), concat(col("tokens"), array(lit(9))).as("tokens"),
        (col("n_tok") + 1).as("n_tok"), col("source")).localCheckpoint()
    Maintenance.mergeInto(spark, t, upd)
    val ch = Changelog.changesBetween(spark, t, Some(s0))
    assert(ch.columns.contains("quality"),
      "changelog must be reported in the current (evolved) schema")
    assert(types(ch) == Map("delete" -> 20L, "insert" -> 20L))
    val ins = ch.filter(col(Changelog.ChangeTypeCol) === "insert")
    assert(ins.filter(col("n_tok") > 0 && col("quality").isNull).count() == 20)
  }

  test("unknown/expired from and inverted ranges fail loudly") {
    val t = mk(100, 1)
    val s0 = t.metadata.currentSnapshotId.get
    val e = intercept[RuntimeException](
      Changelog.changesBetween(spark, t, Some(s0 + 999)))
    assert(e.getMessage.contains("unknown or expired"))
    t.commit("append", t.stageWrite(t.scan(spark).limit(1).select(
      concat(lit("z"), col("doc_id")).as("doc_id"),
      col("tokens"), col("n_tok"), col("source")), "one"))
    val s1 = t.metadata.currentSnapshotId.get
    intercept[IllegalArgumentException](
      Changelog.changesBetween(spark, t, Some(s1), Some(s0)))
  }
}
