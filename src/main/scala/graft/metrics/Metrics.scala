package graft.metrics

import scala.util.DynamicVariable

/**
 * Named-metric registry — the reference's metrics layer
 * (reference nodestream/metrics.py:13-120 `Metric`/`MetricHandler`,
 * `Metrics` context at metrics.py:332-381) recast for a driver-coordinated
 * Spark engine. Executor-side numbers arrive through Spark-native channels
 * (an `Observation` riding the write action, accumulators); this registry is
 * the driver-side aggregation point: named metrics fan out to pluggable
 * handlers, a scoped current registry stands in for the reference's
 * ContextVar, and `accumulate` metrics reset on discharge exactly like the
 * reference's per-tick counters.
 */
final case class Metric(name: String, description: String = "", accumulate: Boolean = false)

object StandardMetrics {
  // reference metrics.py:100-134
  val Records = Metric("records", "records processed", accumulate = true)
  val RecordsWritten = Metric("records_written", "records written by a sink", accumulate = true)
  val StepsRun = Metric("steps_run", "pipeline steps executed", accumulate = true)
  val FatalErrors = Metric("fatal_errors", "steps aborted by a fatal error", accumulate = true)
  val StepDurationMs = Metric("step_duration_ms", "last step wall ms")
  val SnapshotsCommitted = Metric("snapshots_committed", "table commits", accumulate = true)
}

trait MetricHandler {
  def increment(m: Metric, v: Double): Unit
  def decrement(m: Metric, v: Double): Unit
  def setValue(m: Metric, v: Double): Unit
  /** Flush/render hook (console table / JSON log line in the reference). */
  def tick(): Unit = ()
}

/** Thread-safe in-memory handler; `discharge()` returns the current values
  * and resets accumulating metrics (reference JsonLogMetricHandler
  * .discharge, metrics.py:276-284). */
final class InMemoryMetricHandler extends MetricHandler {
  private val values = scala.collection.concurrent.TrieMap[Metric, Double]()
  def increment(m: Metric, v: Double): Unit =
    values.updateWith(m) { c => Some(c.getOrElse(0.0) + v) }
  def decrement(m: Metric, v: Double): Unit =
    values.updateWith(m) { c => Some(c.getOrElse(0.0) - v) }
  def setValue(m: Metric, v: Double): Unit = values.update(m, v)
  def snapshot(): Map[String, Double] = values.iterator.map { case (m, v) => m.name -> v }.toMap
  def discharge(): Map[String, Double] = {
    val out = snapshot()
    values.keys.filter(_.accumulate).foreach(m => values.update(m, 0.0))
    out
  }
}

/** Emits one JSON line per tick (reference JsonLogMetricHandler). */
final class JsonLineMetricHandler(out: String => Unit = s => System.err.println(s))
    extends MetricHandler {
  private val mem = new InMemoryMetricHandler
  def increment(m: Metric, v: Double): Unit = mem.increment(m, v)
  def decrement(m: Metric, v: Double): Unit = mem.decrement(m, v)
  def setValue(m: Metric, v: Double): Unit = mem.setValue(m, v)
  override def tick(): Unit = {
    val kv = mem.discharge().toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${if (v == v.floor) v.toLong else v}""" }
    out(kv.mkString("{\"metrics\":{", ",", "}}"))
  }
}

/** Fan-out registry over any number of handlers (reference AggregateHandler). */
final class Metrics(val handlers: Seq[MetricHandler]) {
  def increment(m: Metric, v: Double = 1.0): Unit = handlers.foreach(_.increment(m, v))
  def decrement(m: Metric, v: Double = 1.0): Unit = handlers.foreach(_.decrement(m, v))
  def setValue(m: Metric, v: Double): Unit = handlers.foreach(_.setValue(m, v))
  def tick(): Unit = handlers.foreach(_.tick())
}

object Metrics {
  private val noop = new Metrics(Seq.empty)
  private val current = new DynamicVariable[Metrics](noop)

  /** The registry of the enclosing `scoped` block — the ContextVar analogue
    * (metrics.py:332, 377-381): code deep inside a pipeline reports without
    * threading the registry through every signature; outside any scope,
    * reporting is a no-op. */
  def get: Metrics = current.value

  def scoped[A](handlers: MetricHandler*)(body: => A): A =
    current.withValue(new Metrics(handlers.toSeq))(body)
}
