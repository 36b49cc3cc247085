package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.registry._

/** API façade mirroring the reference's 7 HTTP endpoints
  * (reference: server/routes/index.js:3-67; controllers/csv-import.js) with
  * the same result shapes, re-expressed over Spark frames.
  *
  * | Reference endpoint           | Method here        |
  * |------------------------------|--------------------|
  * | GET  /content-types          | contentTypes       |
  * | POST /preview/:ct            | preview            |
  * | POST /upload/:ct (validate)  | validate           |
  * | POST /import/:ct             | importCsv          |
  * | POST /export/:ct             | exportCsv          |
  * | POST /upload-zip             | (sources.ZipSource)|
  * | POST /upload-media-zip       | (sources.ZipSource + operators.Media) |
  */
final class Engine(
    val spark: SparkSession,
    val registry: ContentTypeRegistry,
    /** uid → (stored table frame, id column name) */
    tables: String => (DataFrame, String),
) {

  // ------------------------------------------------------------ results
  final case class ValidationReport(
      valid: Boolean,
      errors: Seq[String],
      warnings: Seq[String],
      totalRows: Long,
      invalidRows: Long,
      preview: Seq[Map[String, String]],
  )
  final case class ImportResult(
      created: Long, updated: Long,
      errors: Seq[String], totalProcessed: Long, warnings: Seq[String],
      merged: DataFrame,
  )

  /** GET /content-types — importable tables with schema summaries
    * (reference: controllers/csv-import.js:133-204).
    */
  def contentTypes: Seq[ContentType] = registry.importable.values.toSeq.sortBy(_.uid)

  /** POST /preview — first `n` raw rows + headers, no validation
    * (reference: controllers/csv-import.js:89-128, limit 10).
    */
  def preview(csv: DataFrame, n: Int = 10): (Seq[String], Seq[Map[String, String]]) =
    (csv.columns.toSeq, headRows(csv, n))

  private def headRows(df: DataFrame, n: Int): Seq[Map[String, String]] =
    df.limit(n).collect().toSeq.map(r =>
      df.columns.zipWithIndex.map { case (c, i) =>
        c -> Option(r.get(i)).map(_.toString).orNull
      }.toMap)

  /** POST /upload — validate + preview(5) (reference: controllers:25-84). */
  def validate(csv: DataFrame, uid: String): ValidationReport = {
    val ct = registry.contentTypeOrThrow(uid)
    val plan = HeaderMapper.plan(csv.columns.toSeq, ct)
    val (relErrs, relWarns) = HeaderMapper.validateRelationTargets(plan, registry)
    val result = Validator.validate(csv, plan, ct)
    val total = csv.count()
    val invalid = result.invalid.count()
    ValidationReport(
      valid = plan.errors.isEmpty && relErrs.isEmpty && invalid == 0,
      errors = plan.errors ++ relErrs,
      warnings = plan.warnings ++ relWarns,
      totalRows = total,
      invalidRows = invalid,
      preview = headRows(csv, 5),
    )
  }

  /** POST /import — the EP1 pipeline: validate → resolve relations →
    * assemble components → merge (upsert or append)
    * (reference: controllers/csv-import.js:209-295).
    */
  def importCsv(
      csv: DataFrame,
      uid: String,
      upsert: Boolean = false,
      upsertField: String = "id",
  ): ImportResult = {
    val ct = registry.contentTypeOrThrow(uid)
    val plan = HeaderMapper.plan(csv.columns.toSeq, ct)
    val (relErrs, relWarns) = HeaderMapper.validateRelationTargets(plan, registry)
    require(plan.errors.isEmpty && relErrs.isEmpty,
      (plan.errors ++ relErrs).mkString("; ")) // validation gate (:241-252)

    val validated = Validator.validate(csv, plan, ct)
    var df = validated.valid

    // relation resolution (J1-J3)
    plan.valid.foreach {
      case HeaderMapping.RelationSearch(h, a, field) =>
        val (target, idCol) = tables(a.target.get)
        df =
          if (a.isMultiRelation)
            RelationResolver.resolveMultiByField(df, h, target, idCol, field, a.name).drop(h)
          else
            RelationResolver.resolveByField(df, h, target, idCol, field, a.name).drop(h)
      case HeaderMapping.Direct(_, a) if a.isRelation =>
        val (target, idCol) = tables(a.target.get)
        df =
          if (a.isMultiRelation)
            // bare multi: comma-split, J2 cascade per element (:475-493)
            RelationResolver.resolveMultiBare(df, a.name, target, idCol, s"__${a.name}_ids")
              .withColumn(a.name, col(s"__${a.name}_ids")).drop(s"__${a.name}_ids")
          else
            RelationResolver.resolveBare(df, a.name, target, idCol, s"__${a.name}_rid")
              .withColumn(a.name, col(s"__${a.name}_rid")).drop(s"__${a.name}_rid")
      case _ => ()
    }

    // component assembly (N1-N3, J5)
    val lookup: Components.RelationLookup = (d, valueCol, targetUid, field, out) => {
      val (target, idCol) = tables(targetUid)
      RelationResolver.resolveByField(d, valueCol, target, idCol, field, out)
    }
    Components.sourcesFromPlan(plan, registry).foreach { src =>
      df = Components.assemble(df, src, lookup)
    }
    df = df.drop(Validator.RowNumCol)

    // load (S7/S8)
    val (target, _) = tables(uid)
    val merged = Upsert.merge(target, df, upsertField, upsert)
    val rowErrors = validated.invalid
      .select(explode(col(Validator.ErrorsCol)).as("e"))
      .limit(1000).collect().map(_.getString(0)).toSeq
    ImportResult(merged.created, merged.updated, rowErrors,
      totalProcessed = merged.created + merged.updated,
      warnings = plan.warnings ++ relWarns, merged = merged.merged)
  }

  /** POST /export — EP3: populate → flatten → audit-drop → cap
    * (reference: controllers/csv-import.js:300-466).
    */
  def exportCsv(
      uid: String,
      filter: Option[org.apache.spark.sql.Column] = None,
      limit: Int = 1000,
  ): DataFrame = {
    val ct = registry.contentTypeOrThrow(uid)
    val (stored, idCol) = tables(uid)
    var df = filter.fold(stored)(stored.filter)
    ct.attributes.foreach { a =>
      if (a.isRelation) {
        val (target, tIdCol) = tables(a.target.get)
        val display = displayField(a.target.get, tIdCol)
        df =
          if (a.isMultiRelation) Exporter.populateMultiRelation(df, a.name, target, tIdCol, display)
          else Exporter.populateRelation(df, a.name, target, tIdCol, display)
      } else if (a.isComponent) {
        if (a.repeatable) {
          val max = Exporter.maxArraySize(df, a.name)
          df = Exporter.flattenRepeatableComponent(df, a.name, max)
        } else df = Exporter.flattenSingleComponent(df, a.name)
      }
    }
    Exporter.dropAudit(df).orderBy(graft.functions.Cols.qcol(idCol)).limit(limit)
  }

  /** Display attribute for relation flattening: the target's first schema
    * attribute, name/title/displayName/id fallback
    * (reference: controllers/csv-import.js:391, :409).
    */
  private def displayField(targetUid: String, idCol: String): String = {
    val (target, _) = tables(targetUid)
    registry.contentType(targetUid)
      .flatMap(_.attributes.headOption.map(_.name))
      .filter(target.columns.contains)
      .orElse(Seq("name", "title", "displayName").find(target.columns.contains))
      .getOrElse(idCol)
  }
}
