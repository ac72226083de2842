package graft

import org.apache.spark.sql.functions._

import graft.functions.{Curves, GraftFunctions}

/** SQL + Column exposure of the custom curve expressions must agree with
  * the reference Scala implementation bit-for-bit. */
class GraftFunctionsSpec extends SparkSpec {

  test("zorder_key / hilbert_key agree with Curves over the full 2d cube, SQL and Column API") {
    GraftFunctions.register(spark)
    val bits = 4
    val df = spark.range(1 << (2 * bits)).select(
      (col("id") / (1 << bits)).cast("int").as("x"),
      pmod(col("id"), lit(1 << bits)).cast("int").as("y"))
    df.createOrReplaceTempView("cube")

    val viaSql = spark.sql(
      s"SELECT x, y, zorder_key($bits, x, y) AS z, hilbert_key($bits, x, y) AS h FROM cube")
      .collect()
    viaSql.foreach { r =>
      val coords = Array(r.getInt(0), r.getInt(1))
      assert(r.getLong(2) == Curves.zValue(coords, bits))
      assert(r.getLong(3) == Curves.hilbertValue(coords, bits))
    }

    val viaCol = df.select(
      GraftFunctions.zorder_key(bits, col("x"), col("y")).as("z")).collect()
    viaCol.zip(viaSql).foreach { case (a, b) => assert(a.getLong(0) == b.getLong(2)) }
  }

  test("LoggerWriter counts every row while capping per-partition log volume") {
    val df = spark.range(1000).repartition(4).toDF("id")
    assert(graft.ops.LoggerWriter.write(df, maxPerPartition = 5) == 1000L)
  }
}
