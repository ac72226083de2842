package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * FileExtractor recast (reference nodestream/pipeline/extractors/files.py:
 * 265-393): a glob of files becomes a DataFrame, with the codec picked by
 * extension — the reference's SupportedFileFormat registry. Compression
 * sniffing (`.gz`, `.bz2`, …) is inherited from Spark's text-based sources,
 * which decode by extension exactly like the reference's `.gz` unwrap
 * (files.py:83-103).
 *
 *   parquet          → native columnar scan (stats + pushdown)
 *   json / jsonl     → spark.read.json (one record per line, like the
 *                      reference's JsonLinesFileFormat; a whole-file JSON
 *                      array needs multiLine=true which callers can pass)
 *   csv              → header csv
 *   txt              → one record per line, column `line` (files.py:344-352)
 *   yaml / yml       → whole-file YAML documents (list-of-maps or single
 *                      map) parsed with SnakeYAML per file inside tasks,
 *                      re-encoded as JSON and read through the JSON codec so
 *                      schema inference matches the other formats
 */
object FileSource {

  def read(
      spark: SparkSession,
      pattern: String,
      format: Option[String] = None,
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val fmt = format.getOrElse(sniffFormat(pattern))
    def withSchema[A](r: org.apache.spark.sql.DataFrameReader) = {
      val withOpts = r.options(options)
      schema.map(withOpts.schema).getOrElse(withOpts)
    }
    fmt match {
      case "parquet"          => withSchema(spark.read).parquet(pattern)
      case "json" | "jsonl"   => withSchema(spark.read).json(pattern)
      case "csv"              => withSchema(spark.read.option("header", "true")).csv(pattern)
      case "txt" | "text"     => spark.read.text(pattern).withColumnRenamed("value", "line")
      case "yaml" | "yml"     => readYaml(spark, pattern, schema)
      case other              => sys.error(s"FileSource: unsupported format '$other'")
    }
  }

  /** Codec by extension, looking through one trailing compression suffix —
    * the reference's path.suffixes chain (files.py:83-103). */
  private[sources] def sniffFormat(pattern: String): String = {
    val name = pattern.split('/').last
    val parts = name.split('.').toSeq.drop(1)
    val compressions = Set("gz", "bz2", "zst", "snappy", "lz4", "deflate")
    parts.reverse.find(p => !compressions.contains(p.toLowerCase))
      .map(_.toLowerCase).getOrElse(sys.error(s"FileSource: no codec extension in $pattern"))
  }

  /** Whole-file YAML → JSON lines → spark.read.json. YAML files are small
    * config-shaped documents in the reference (files.py:365-374); each task
    * parses its own files, so the driver never touches contents. */
  private def readYaml(
      spark: SparkSession, pattern: String, schema: Option[StructType]): DataFrame = {
    import spark.implicits._
    val jsonLines = spark.sparkContext.wholeTextFiles(pattern).flatMap { case (_, text) =>
      // SafeConstructor: data files must never instantiate arbitrary classes
      val yaml = new org.yaml.snakeyaml.Yaml(
        new org.yaml.snakeyaml.constructor.SafeConstructor(
          new org.yaml.snakeyaml.LoaderOptions))
      val docs = yaml.loadAll(text).asScala.toSeq
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      docs.flatMap {
        case l: java.util.List[_] => l.asScala.map(d => mapper.writeValueAsString(d))
        case null                 => Seq.empty
        case d                    => Seq(mapper.writeValueAsString(d))
      }
    }.toDS()
    val r = spark.read
    schema.map(r.schema).getOrElse(r).json(jsonLines)
  }
}
