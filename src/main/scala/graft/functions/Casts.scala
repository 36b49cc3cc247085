package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.registry.{Attribute, AttrKind}

/** Typed cast + validation expressions.
  *
  * Each cast mirrors the coercion semantics of the reference's
  * `validateCsvData` (reference: server/services/csv-import.js:127-197) and
  * `convertComponentFieldValue` (:774-803), but expressed as codegen-friendly
  * Column expressions (no UDFs) so they stay inside whole-stage codegen.
  *
  * Convention: each `castX` returns null when the input can't be coerced;
  * the companion `errorX` predicate is true exactly when the input is
  * non-empty but un-coercible — that drives the error-accumulation column
  * (SURVEY §2.2 P5/P6).
  */
object Casts {

  /** Empty string ≡ missing (reference: server/services/csv-import.js:125). */
  def isMissing(c: Column): Column = c.isNull || trim(c) === ""

  private def tryCast(c: Column, to: String): Column =
    when(isMissing(c), lit(null)).otherwise(trim(c)).try_cast(to)

  /** integer / biginteger: parseInt semantics, NaN ⇒ error (:128-136). */
  def castInt(c: Column): Column = tryCast(c, "int")
  def castLong(c: Column): Column = tryCast(c, "long")

  /** decimal / float: parseFloat semantics (:138-146). */
  def castDouble(c: Column): Column = tryCast(c, "double")

  /** boolean accepting true/false/1/0/yes/no case-insensitively
    * (reference: server/services/csv-import.js:148-155). Spark's native cast
    * rejects yes/no, hence the explicit form. Null when unrecognized.
    */
  def castBool(c: Column): Column = {
    val v = lower(trim(c))
    when(v.isin("true", "1", "yes"), lit(true))
      .when(v.isin("false", "0", "no"), lit(false))
      .otherwise(lit(null).cast("boolean"))
  }

  /** date/datetime/time: `new Date(value)` then ISO normalization
    * (:157-166). We store TimestampType; `isoString` reproduces the
    * reference's toISOString output when string fidelity is needed.
    */
  def castTimestamp(c: Column): Column = {
    val t = trim(c)
    when(isMissing(c), lit(null).cast("timestamp"))
      .otherwise(coalesce(
        t.try_cast("timestamp"),
        try_to_timestamp(t, lit("yyyy-MM-dd'T'HH:mm:ss.SSSX")),
        try_to_timestamp(t, lit("MM/dd/yyyy")),
      ))
  }

  /** ISO-8601 string form, reference `toISOString()` (:164). */
  def isoString(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")

  /** email regex, verbatim from the reference (:170). */
  val EmailRegex = "^[^\\s@]+@[^\\s@]+\\.[^\\s@]+$"
  def isValidEmail(c: Column): Column = trim(c).rlike(EmailRegex)

  /** enumeration membership (:177-183). */
  def inEnum(c: Column, values: Seq[String]): Column =
    trim(c).isin(values: _*)

  /** Numeric-string test used by the bare-value relation cascade
    * (reference: server/services/csv-import.js:557 `!isNaN(Number(value))`).
    */
  def isNumeric(c: Column): Column = trim(c).try_cast("double").isNotNull

  /** Comma-split + per-element trim, dropping empty elements
    * (reference: server/services/csv-import.js:478, :712).
    */
  def splitTrim(c: Column): Column =
    filter(transform(split(c, ","), x => trim(x)), x => x =!= "")

  /** Cast a raw string column to the storage type of a scalar attribute.
    * Relations/components/media are handled by their own operators.
    */
  def castForAttribute(c: Column, attr: Attribute): Column = attr.kind match {
    case AttrKind.IntegerK                         => castInt(c)
    case AttrKind.BigIntegerK                      => castLong(c)
    case AttrKind.DecimalK | AttrKind.FloatK       => castDouble(c)
    case AttrKind.BooleanK                         => castBool(c)
    case AttrKind.DateK | AttrKind.DateTimeK | AttrKind.TimeK => castTimestamp(c)
    case _ => when(isMissing(c), lit(null).cast("string")).otherwise(c)
  }

  /** Error message for one failed field, in the reference's format
    * (`Row N: "field" must be …`; reference messages at
    * server/services/csv-import.js:132,142,152,162,172,180,199).
    * `rowNum` is the 1-based input row number.
    */
  def errorFor(attr: Attribute, raw: Column, rowNum: Column): Column = {
    val prefix = concat(lit("Row "), rowNum.cast("string"), lit(s""": "${attr.name}" """))
    val present = !isMissing(raw)
    val bad: Option[Column] = attr.kind match {
      case AttrKind.IntegerK | AttrKind.BigIntegerK =>
        Some(when(present && castLong(raw).isNull, concat(prefix, lit("must be a valid integer"))))
      case AttrKind.DecimalK | AttrKind.FloatK =>
        Some(when(present && castDouble(raw).isNull, concat(prefix, lit("must be a valid number"))))
      case AttrKind.BooleanK =>
        Some(when(present && castBool(raw).isNull, concat(prefix, lit("must be a valid boolean (true/false, 1/0, yes/no)"))))
      case AttrKind.DateK | AttrKind.DateTimeK | AttrKind.TimeK =>
        Some(when(present && castTimestamp(raw).isNull, concat(prefix, lit("must be a valid date"))))
      case AttrKind.EmailK =>
        Some(when(present && !isValidEmail(raw), concat(prefix, lit("must be a valid email address"))))
      case AttrKind.EnumerationK =>
        Some(when(present && !inEnum(raw, attr.enumValues),
          concat(prefix, lit(s"must be one of: ${attr.enumValues.mkString(", ")}"))))
      case _ => None
    }
    val requiredErr =
      if (attr.required && attr.default.isEmpty)
        Some(when(isMissing(raw), concat(prefix, lit("is required"))))
      else None
    (bad, requiredErr) match {
      case (Some(b), Some(r)) => coalesce(r, b)
      case (Some(b), None)    => b
      case (None, Some(r))    => r
      case (None, None)       => lit(null).cast("string")
    }
  }
}
