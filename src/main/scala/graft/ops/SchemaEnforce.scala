package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * SchemaEnforcer recast (reference nodestream/pipeline/filters.py:179-363):
 * the reference's filter is a state machine that *infers* a JSON schema from
 * the first N records (genson), persists it, then *enforces* (drop
 * non-conforming) or *warns* (log and pass). Spark-native: inference is a
 * bounded `spark.read.json` sample (driver-side, once per pipeline — the
 * analogue of the reference's N-record inference window), and enforcement is
 * a declarative `from_json` + validity predicate that runs codegen'd inside
 * the scan stage.
 */
object SchemaEnforce {

  /** Infer a StructType from a bounded sample of a JSON-string column —
    * the Infer state (reference filters.py:260-291). */
  def inferJsonSchema(df: DataFrame, jsonCol: String, sampleN: Int = 100): StructType = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df.select(col(jsonCol)).as[String].filter((s: String) => s != null).limit(sampleN)
    val inferred = spark.read.json(sample).schema
    // corrupt sample records surface as the corrupt-record column, not schema
    StructType(inferred.fields.filterNot(
      _.name == spark.conf.get("spark.sql.columnNameOfCorruptRecord", "_corrupt_record")))
  }

  /** Validity of a JSON string against an inferred schema: parseable AND
    * every top-level inferred field present (non-null). */
  def conforms(jsonCol: Column, schema: StructType): Column = {
    val parsed = from_json(jsonCol, schema)
    schema.fields.foldLeft(parsed.isNotNull) { (acc, f) =>
      acc && parsed.getField(f.name).isNotNull
    }
  }

  /** Enforce mode: drop records that do not conform (filters.py:294-311). */
  def enforce(df: DataFrame, jsonCol: String, schema: StructType): DataFrame =
    df.filter(conforms(col(jsonCol), schema))

  /** Warn mode: pass everything, tag validity (filters.py:314-335). */
  def warn(df: DataFrame, jsonCol: String, schema: StructType): DataFrame =
    df.withColumn("_schema_valid", conforms(col(jsonCol), schema))

  /** Persisted-schema round trip — the reference stores the inferred schema
    * in its object store (filters.py:286-291); we serialize the StructType
    * JSON so a Fetch-mode enforcer can reload it. */
  def schemaToJson(s: StructType): String = s.json
  def schemaFromJson(j: String): StructType = DataType.fromJson(j).asInstanceOf[StructType]
}
