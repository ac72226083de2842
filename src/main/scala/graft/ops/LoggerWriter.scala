package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * The debug sink (reference nodestream/pipeline/writers.py:37-53): every
 * record is rendered and logged. Recast for a distributed engine: rendering
 * and logging happen executor-side per partition (the driver never sees the
 * data), capped per partition so a debug sink cannot flood executor logs at
 * corpus scale, with an accumulator carrying the exact total back.
 */
object LoggerWriter {

  /** Log up to `maxPerPartition` JSON-rendered rows per partition at INFO;
    * returns the total row count (all rows are counted, not just logged). */
  def write(df: DataFrame, maxPerPartition: Int = 100): Long = {
    val counter = df.sparkSession.sparkContext.longAccumulator("logger_writer_rows")
    df.toJSON.foreachPartition { it: Iterator[String] =>
      val log = org.slf4j.LoggerFactory.getLogger("graft.LoggerWriter")
      var logged = 0
      it.foreach { r =>
        counter.add(1)
        if (logged < maxPerPartition) { log.info(r); logged += 1 }
      }
    }
    counter.value
  }
}
