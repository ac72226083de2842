package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Interpretation-step column builders with the reference's error semantics:
 *
 *   - [[switchOn]] — SwitchInterpretation / SwitchTransformer routing. With
 *     no default and `failOnUnhandled`, an unmatched key raises (reference
 *     `UnhandledBranchError`, nodestream/interpreting/interpretations/
 *     switch_interpretation.py:35-131) instead of silently passing a null.
 *   - [[findManyZip]] — the MultiNodeKeySearchAlgorithm key zip. Ragged
 *     arrays raise (reference `InvalidKeyLengthError`,
 *     nodestream/interpreting/interpretations/relationship_interpretation.py:
 *     27-33) instead of null-padding.
 *
 * Both run as codegen'd column expressions; `raise_error` aborts the task
 * like the reference aborts the pipeline on a fatal interpretation error.
 */
object Interpret {

  /** Route `key` through literal-keyed branches. `default` = the reference's
    * fallback interpretation; with none and `failOnUnhandled` an unmatched
    * key raises UnhandledBranchError; with neither, unmatched yields null
    * (the lenient mode). */
  def switchOn(
      key: Column,
      branches: Seq[(String, Column)],
      default: Option[Column] = None,
      failOnUnhandled: Boolean = false): Column = {
    require(branches.nonEmpty, "switchOn needs at least one branch")
    val base = branches.tail.foldLeft(when(key === branches.head._1, branches.head._2)) {
      case (acc, (k, v)) => acc.when(key === k, v)
    }
    default match {
      case Some(d)                 => base.otherwise(d)
      case None if failOnUnhandled => base.otherwise(raise_error(
        concat(lit("UnhandledBranchError: no branch for value '"),
          coalesce(key.cast("string"), lit("null")), lit("'"))))
      case None                    => base
    }
  }

  /** Zip parallel key/value arrays into an array of (k, v) structs. Ragged
    * lengths raise InvalidKeyLengthError (reference semantics); pass
    * `failOnRagged = false` for arrays_zip's null-padding. */
  def findManyZip(keys: Column, values: Column, failOnRagged: Boolean = true): Column =
    if (!failOnRagged) arrays_zip(keys, values)
    else when(keys.isNull || values.isNull, lit(null)) // absent is not ragged
      .when(size(keys) === size(values), arrays_zip(keys, values))
      .otherwise(raise_error(format_string(
        "InvalidKeyLengthError: find_many arrays have lengths %d and %d",
        size(keys), size(values))))
}
