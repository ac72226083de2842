package graft

import org.apache.spark.sql.functions._

import graft.gen.SequenceGen
import graft.maintenance.{CreationRule, Maintenance}

/** Observed per-flush counters (QueryExecutorWithStatistics analogue): a
  * MERGE's snapshot summary carries rows/tokens observed on the write action
  * itself — no extra job. */
class MetricsSpec extends SparkSpec {

  test("mergeInto records observed row and token counters in the snapshot summary") {
    val root = tmpDir("graft-metrics")
    val t = SequenceGen.createTable(spark, s"$root/tbl", nDocs = 300, nFiles = 4)
    val batch = t.scan(spark).filter(col("doc_id") < "doc000000000050")
      .select(col("doc_id"), col("tokens"), (col("n_tok") + 0).as("n_tok"), col("source"))
    val snap = Maintenance.mergeInto(spark, t, batch, CreationRule.Eager)
    val rows = snap.summary.get("observed-rows").map(_.toLong)
    val toks = snap.summary.get("observed-tokens").map(_.toLong)
    assert(rows.nonEmpty && toks.nonEmpty, s"missing observed counters: ${snap.summary}")
    // the COW rewrite writes every row of the touched files — at least the
    // batch rows, at most the whole table
    assert(rows.get >= 50 && rows.get <= 300)
    val total = t.scan(spark).agg(sum(col("n_tok").cast("long"))).collect()(0).getLong(0)
    assert(toks.get > 0 && toks.get <= total)
  }

  test("Records metric rides the merge step's observed-rows summary through the runner") {
    import graft.metrics._
    val root = tmpDir("graft-metrics3")
    val t = SequenceGen.createTable(spark, s"$root/tbl", nDocs = 200, nFiles = 3)
    val batch = t.scan(spark).limit(40)
      .select(col("doc_id"), col("tokens"), col("n_tok"), col("source"))
    val mem = new InMemoryMetricHandler
    Metrics.scoped(mem) {
      graft.plans.PipelineRunner.run(spark, t,
        Seq(graft.plans.MergeStep(CreationRule.Eager)), mergeBatch = Some(batch))
    }
    val snap = mem.snapshot()
    assert(snap(StandardMetrics.Records.name) >= 40.0,
      s"observed-rows did not reach the Records metric: $snap")
  }

  test("scoped metrics registry aggregates pipeline-step counters; no-op outside a scope") {
    import graft.metrics._
    val root = tmpDir("graft-metrics2")
    val t = SequenceGen.createTable(spark, s"$root/tbl", nDocs = 400, nFiles = 6)
    val mem = new InMemoryMetricHandler
    var jsonLines = Vector.empty[String]
    Metrics.scoped(mem, new JsonLineMetricHandler(l => jsonLines :+= l)) {
      graft.plans.PipelineRunner.run(spark, t, graft.plans.PipelineDsl.parse(
        """- implementation: compact
          |  arguments: { target_file_bytes: 8388608, small_file_threshold: 50331648 }
          |- implementation: set_ref
          |  arguments: { name: after-compact }
          |""".stripMargin))
    }
    val snap = mem.snapshot()
    assert(snap(StandardMetrics.StepsRun.name) == 2.0, s"got $snap")
    assert(snap(StandardMetrics.SnapshotsCommitted.name) == 1.0) // set_ref commits no snapshot
    assert(snap(StandardMetrics.RecordsWritten.name) == 400.0)
    assert(snap(StandardMetrics.StepDurationMs.name) >= 0.0)
    assert(jsonLines.nonEmpty && jsonLines.head.startsWith("{\"metrics\":{"))
    // accumulate metrics reset on discharge; gauges persist
    val discharged = mem.discharge()
    assert(discharged(StandardMetrics.StepsRun.name) == 2.0)
    assert(mem.snapshot()(StandardMetrics.StepsRun.name) == 0.0)
    assert(mem.snapshot()(StandardMetrics.StepDurationMs.name) >= 0.0)
    // outside any scope: reporting is a silent no-op
    Metrics.get.increment(StandardMetrics.Records)
  }
}
