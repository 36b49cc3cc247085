package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Casts
import graft.functions.Cols.qcol
import graft.registry.ContentType

/** Typed validation with error accumulation and row routing.
  *
  * Reproduces `validateCsvData`'s per-row loop
  * (reference: server/services/csv-import.js:95-217) as a single declarative
  * pass: every mapped scalar column contributes a `when(...)` error message
  * into an `__errors: array<string>` column; rows split into valid (cleaned,
  * casts applied) and invalid (original strings + errors).
  *
  * Row numbering: the reference reports `Row ${index+1}` in input order
  * (:132 etc.). Input order on a distributed read is per-file; we use
  * `monotonically_increasing_id` BEFORE any wide transform — within one
  * input file at small scale this matches input order; at cluster scale row
  * numbers are stable-but-per-partition-offset (documented deviation, see
  * SURVEY §7.5.1). No global sort is introduced: a window over all rows
  * would serialize the scan on one partition at 100 TB.
  */
object Validator {

  val ErrorsCol = "__errors"
  val RowNumCol = "__rownum"

  final case class Result(
      valid: DataFrame,
      invalid: DataFrame,
      /** both frames before the split, with casts + errors attached */
      routed: DataFrame,
  )

  /** `df` is the raw all-string CSV frame; `plan` maps its headers.
    * Direct scalar columns are cast in place (renamed to the attribute
    * name); relation/component columns are left as raw strings for the
    * downstream resolver/assembler but participate in required checks.
    */
  def validate(df: DataFrame, plan: HeaderPlan, ct: ContentType): Result = {
    val withRow = df.withColumn(RowNumCol, monotonically_increasing_id() + 1)

    val direct = plan.valid.collect {
      case HeaderMapping.Direct(h, a) if !a.isRelation && !a.isComponent && !a.isMedia => (h, a)
    }
    val rowNum = col(RowNumCol)

    // one error slot per validated column + required checks for direct cols
    val errorExprs: Seq[Column] = direct.map { case (h, a) =>
      Casts.errorFor(a, qcol(h), rowNum)
    }
    val errorsArr =
      if (errorExprs.isEmpty) array().cast("array<string>")
      else filter(array(errorExprs: _*), e => e.isNotNull)

    val routed = withRow.withColumn(ErrorsCol, errorsArr)

    // valid frame: apply casts, rename headers → attribute names, apply
    // defaults for missing required-with-default fields (:62-65)
    val castCols: Seq[Column] = plan.valid.map {
      case HeaderMapping.Direct(h, a) if !a.isRelation && !a.isComponent && !a.isMedia =>
        val cast = Casts.castForAttribute(qcol(h), a)
        val withDefault = a.default match {
          case Some(d) => coalesce(cast, Casts.castForAttribute(lit(d), a))
          case None    => cast
        }
        withDefault.as(a.name)
      case HeaderMapping.Direct(h, a)            => qcol(h).as(a.name) // relation/media raw
      case HeaderMapping.RelationSearch(h, _, _) => qcol(h).as(h)
      case HeaderMapping.ComponentPath(h, _, _)  => qcol(h).as(h)
      case HeaderMapping.Invalid(h, _)           => qcol(h).as(h) // dropped below
    }

    val keep = castCols ++ Seq(rowNum, col(ErrorsCol))
    val invalidHeaders = plan.invalidHeaders.toSet
    val projected = routed.select(keep: _*)
    // unknown columns are pruned (reference :78-84, :102) — they were never
    // selected above except via Invalid mappings, which we drop here
    val cleaned = invalidHeaders.foldLeft(projected)((d, h) => d.drop(h))

    val valid = cleaned.filter(size(col(ErrorsCol)) === 0).drop(ErrorsCol)
    val invalid = routed.filter(size(col(ErrorsCol)) > 0)
    Result(valid, invalid, routed)
  }
}
