package graft

import org.apache.spark.sql.functions._

import graft.gen.SequenceGen
import graft.maintenance._
import graft.plans._
import graft.table.{AddColumn, DropColumn, RenameColumn}

class PipelineDslSpec extends SparkSpec {

  val yaml: String =
    """- implementation: compact
      |  annotations: [nightly]
      |  arguments:
      |    target_file_bytes: 33554432
      |    small_file_threshold: 33554432
      |- implementation: zorder
      |  arguments:
      |    columns: [doc_id, source, n_tok]
      |    target_file_bytes: 2097152
      |- implementation: expire_snapshots
      |  arguments: { retain_last: 1 }
      |- implementation: remove_orphans
      |  arguments: { grace_ms: 0 }
      |""".stripMargin

  test("yaml parses to the step ADT") {
    val steps = PipelineDsl.parse(yaml)
    assert(steps.size == 4)
    assert(steps(0) == CompactStep(33554432L, Some(33554432L), 8))
    assert(steps(1) == ClusterStep(ZOrder(Seq("doc_id", "source", "n_tok")), 2097152L))
    assert(steps(2) == ExpireSnapshotsStep(Some(1), None))
    assert(steps(3) == RemoveOrphansStep(Some(0L)))
  }

  test("annotation targeting filters annotated steps, keeps unannotated") {
    val steps = PipelineDsl.parse(yaml, annotationTargets = Some(Set("weekly")))
    assert(steps.map(_.name) == Seq("zorder", "expire_snapshots", "remove_orphans"))
    val nightly = PipelineDsl.parse(yaml, annotationTargets = Some(Set("nightly")))
    assert(nightly.size == 4)
  }

  test("!env argument resolution fails loudly when unset") {
    val y = "- implementation: expire_snapshots\n  arguments: { retain_last: !env GRAFT_NO_SUCH_VAR }\n"
    val e = intercept[RuntimeException](PipelineDsl.parse(y))
    assert(e.getMessage.contains("GRAFT_NO_SUCH_VAR"))
  }

  test("optimizer: layout pass before full recluster is dead work") {
    val plan = PlanOptimizer.optimize(Seq(
      CompactStep(1L, None, 8),
      ClusterStep(ZOrder(Seq("doc_id")), 2L),
      ClusterStep(Hilbert(Seq("doc_id")), 3L)))
    assert(plan == Seq(ClusterStep(Hilbert(Seq("doc_id")), 3L)))
  }

  test("optimizer: rewrite_manifests before a data commit is dead work") {
    val plan = PlanOptimizer.optimize(Seq(
      RewriteManifestsStep(10),
      CompactStep(1L, None, 8),
      RewriteManifestsStep(10)))
    assert(plan == Seq(CompactStep(1L, None, 8), RewriteManifestsStep(10)))
  }

  test("optimizer: expire runs merge; orphan runs collapse; schema ops reduce") {
    val plan = PlanOptimizer.optimize(Seq(
      ExpireSnapshotsStep(Some(3), None),
      ExpireSnapshotsStep(Some(1), Some(99L)),
      RemoveOrphansStep(Some(60000L)),
      RemoveOrphansStep(Some(0L)),
      SchemaStep(AddColumn("q", "DOUBLE")),
      SchemaStep(RenameColumn("q", "quality")),
      SchemaStep(DropColumn("quality"))))
    // two GC runs == one at the smaller grace window
    assert(plan == Seq(ExpireSnapshotsStep(Some(1), Some(99L)), RemoveOrphansStep(Some(0L))))
  }

  test("pipeline end-to-end: yaml -> optimize -> run preserves content") {
    val root = tmpDir("dsl-e2e")
    val t = SequenceGen.createTable(spark, s"$root/tbl", nDocs = 4000, nFiles = 24)
    def fp() = t.scan(spark).select(
      count(lit(1)), bit_xor(xxhash64(col("doc_id"), col("tokens"), col("n_tok"), col("source"))))
      .collect()(0).toString
    val before = fp()
    val results = PipelineRunner.run(spark, t, PipelineDsl.parse(yaml))
    // the optimizer drops the compact: it is dead work before a full recluster
    assert(results.map(_.step) == Seq("zorder", "expire_snapshots", "remove_orphans"))
    assert(fp() == before)
    assert(results.last.summary("removed").toInt > 0)
    // zorder committed a snapshot and expire left exactly one
    assert(t.metadata.snapshots.size == 1)
  }

  test("expire with no args applies the table's declared retention policy") {
    val root = tmpDir("dsl-retention")
    val t = SequenceGen.createTable(spark, s"$root/tbl", nDocs = 200, nFiles = 2)
    SequenceGen.appendScattered(spark, t, 100, 1, seed = 7)
    SequenceGen.appendScattered(spark, t, 100, 1, seed = 8)
    assert(t.metadata.snapshots.size == 3)
    t.updateProperties(Map("retention.snapshot.keep-last" -> "2"))
    val r = PipelineRunner.run(spark, t, PipelineDsl.parse(
      "- implementation: expire_snapshots\n"))
    assert(r.head.summary("retained-snapshots") == "2", r.head.summary)
    assert(t.metadata.snapshots.size == 2)
    // an explicit argument still beats the property
    PipelineRunner.run(spark, t, PipelineDsl.parse(
      "- implementation: expire_snapshots\n  arguments: { retain_last: 1 }\n"))
    assert(t.metadata.snapshots.size == 1)
  }

  test("ref steps: set_ref tags the current snapshot, rollback returns to it") {
    val root = tmpDir("dsl-refs")
    val t = SequenceGen.createTable(spark, s"$root/tbl", nDocs = 500, nFiles = 4)
    val r1 = PipelineRunner.run(spark, t, PipelineDsl.parse(
      """- implementation: set_ref
        |  arguments: { name: prod }
        |""".stripMargin))
    assert(r1.head.summary("ref") == "prod")
    val pinned = t.refSnapshotId("prod")
    t.commit("append", t.stageWrite(
      SequenceGen.sequences(spark, 50, 9)
        .withColumn("doc_id", concat(lit("x"), col("doc_id"))), "later"))
    assert(t.metadata.currentSnapshotId.get != pinned)
    PipelineRunner.run(spark, t, PipelineDsl.parse(
      s"""- implementation: rollback
         |  arguments: { snapshot_id: $pinned }
         |""".stripMargin))
    assert(t.metadata.currentSnapshotId.get == pinned)
  }
}
