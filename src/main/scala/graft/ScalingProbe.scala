package graft
import org.apache.spark.sql.SparkSession
import graft.gen.SequenceGen
import graft.maintenance.{Concat, Maintenance, ZOrder}
object ScalingProbe {
  def session(cores: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR"); s
  }
  def run(cores: Int, nDocs: Long): Double = {
    val spark = session(cores)
    val root = java.nio.file.Files.createTempDirectory(s"alt-$cores").toString
    val t = SequenceGen.createTable(spark, s"$root/tbl", nDocs, 64)
    val t0 = System.nanoTime()
    Maintenance.compact(spark, t, Concat, targetFileBytes = 8L*1024*1024,
      smallFileThreshold = Some(48L*1024*1024), chunks = 1)
    Maintenance.cluster(spark, t, ZOrder(Seq("doc_id","source","n_tok")),
      targetFileBytes = 2L*1024*1024)
    val sec = (System.nanoTime()-t0)/1e9
    require(t.liveFiles().map(_.records).sum == nDocs)
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
    spark.stop()
    nDocs/sec
  }
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(400000L)
    run(32, nDocs/20) // warmup
    val rs = Seq(8,32,8,32,8,32).map { c => val thr = run(c, nDocs); println(f"PROBE cores=$c thr=$thr%.0f"); (c,thr) }
    val b8 = rs.filter(_._1==8).map(_._2).max; val b32 = rs.filter(_._1==32).map(_._2).max
    println(f"PROBE best8=$b8%.0f best32=$b32%.0f eff=${b32/b8/4}%.3f")
  }
}
