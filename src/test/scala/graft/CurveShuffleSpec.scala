package graft

import org.apache.spark.sql.functions._

import graft.functions.Clustering
import graft.gen.SequenceGen

/** The sampling-free clustered shuffle: CurvePlan must route rows to
  * partitions that are disjoint, curve-key-ordered ranges with ~balanced
  * token mass — equivalent to repartitionByRange(key) but with one scan
  * and mass (not row-count) balance. */
class CurveShuffleSpec extends SparkSpec {

  test("curve plan routes ranges to disjoint ordered partitions with balanced token mass") {
    val df = SequenceGen.sequences(spark, 20000, seed = 7).repartition(8)
    val nOut = 16
    val plan = Clustering.planCurveShuffle(
      df, Seq("doc_id", "source", "n_tok"), bits = 12, hilbert = false,
      nOut = nOut, totalRows = Some(20000), weightCol = Some("n_tok"))

    val routed = df
      .withColumn("_ck", plan.keyCol).withColumn("_rt", plan.routeCol)
      .repartition(plan.nOut, col("_rt"))
      .sortWithinPartitions(col("_ck"))
      .withColumn("_pid", spark_partition_id())

    val stats = routed.groupBy("_pid")
      .agg(min("_ck").as("lo"), max("_ck").as("hi"),
        sum(col("n_tok").cast("long")).as("mass"), count(lit(1)).as("n"))
      .orderBy("_pid").collect()

    // every partition non-empty and plan.nOut partitions materialized
    assert(stats.length == plan.nOut, s"expected ${plan.nOut} partitions, got ${stats.length}")

    // partitions hold disjoint, ordered curve-key ranges (pid order == key order)
    stats.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) <= b.getLong(1),
        s"partition ${a.getInt(0)} hi=${a.getLong(2)} overlaps ${b.getInt(0)} lo=${b.getLong(1)}")
      assert(a.getLong(2) <= b.getLong(1),
        s"ranges overlap: ${a.getLong(2)} > ${b.getLong(1)}")
    }

    // token mass balanced within 2.5x of ideal despite 1% long-doc skew
    val masses = stats.map(_.getLong(3))
    val ideal = masses.sum.toDouble / masses.length
    assert(masses.max < ideal * 2.5,
      s"mass skew: max=${masses.max} ideal=$ideal")

    // no row lost
    assert(routed.count() == 20000)
  }

  test("row-count quantiles would leave heavy straggler partitions; mass quantiles do not") {
    val df = SequenceGen.sequences(spark, 20000, seed = 7).repartition(8)
    // mass-weighted plan bounds vs unweighted: compare heaviest partition share
    def maxShare(weight: Option[String]): Double = {
      val plan = Clustering.planCurveShuffle(
        df, Seq("n_tok"), bits = 12, hilbert = false,
        nOut = 8, totalRows = Some(20000), weightCol = weight)
      val masses = df
        .withColumn("_rt", plan.routeCol)
        .groupBy("_rt").agg(sum(col("n_tok").cast("long")).as("m"))
        .collect().map(_.getLong(1))
      masses.max.toDouble / masses.sum
    }
    val weighted = maxShare(Some("n_tok"))
    val unweighted = maxShare(None)
    assert(weighted < unweighted,
      s"mass weighting should reduce the heaviest partition: $weighted vs $unweighted")
    assert(weighted < 0.3, s"heaviest partition carries $weighted of all tokens")
  }
}
