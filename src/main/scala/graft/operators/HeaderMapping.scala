package graft.operators

import graft.registry.{Attribute, ContentType, ContentTypeRegistry}

/** Resolution of one CSV header against the target content-type schema.
  *
  * Ports the dot-notation grammar of `parseHeaderMapping`
  * (reference: server/services/csv-import.js:223-287):
  *   - plain header matching an attribute        ⇒ Direct
  *   - `relation.field`                          ⇒ RelationSearch
  *   - `component.rest...` (rest may be `rel.f`) ⇒ ComponentPath — the
  *     component field is EVERYTHING after the first segment (:244-253);
  *     the inner `rel.field` re-split happens at component-assembly time
  *     (processComponentData, :749-761).
  *   - anything else ⇒ Invalid (warned + dropped, :78-84, :254-266).
  */
sealed trait HeaderMapping {
  def header: String
}
object HeaderMapping {
  final case class Direct(header: String, attr: Attribute) extends HeaderMapping
  final case class RelationSearch(header: String, attr: Attribute, searchField: String) extends HeaderMapping
  final case class ComponentPath(header: String, attr: Attribute, componentField: String) extends HeaderMapping
  final case class Invalid(header: String, reason: String) extends HeaderMapping
}

final case class HeaderPlan(
    mappings: Seq[HeaderMapping],
    /** schema-level errors: e.g. required attribute with no mapped column
      * (reference: server/services/csv-import.js:62-75)
      */
    errors: Seq[String],
    /** warnings: unknown columns dropped (:78-84) */
    warnings: Seq[String],
) {
  def valid: Seq[HeaderMapping] = mappings.filter {
    case _: HeaderMapping.Invalid => false
    case _                        => true
  }
  def invalidHeaders: Seq[String] = mappings.collect { case HeaderMapping.Invalid(h, _) => h }
}

object HeaderMapper {

  /** Resolve all CSV headers against the content type; reproduces
    * parseHeaderMapping + the schema-level required check.
    */
  def plan(csvHeaders: Seq[String], ct: ContentType): HeaderPlan = {
    val mappings = csvHeaders.map(h => resolve(h, ct))
    val mappedAttrs = mappings.collect {
      case HeaderMapping.Direct(_, a)            => a.name
      case HeaderMapping.RelationSearch(_, a, _) => a.name
      case HeaderMapping.ComponentPath(_, a, _)  => a.name
    }.toSet
    // Required, non-defaulted attributes must have at least one mapped
    // column (reference: server/services/csv-import.js:62-75).
    val errors = ct.attributes.collect {
      case a if a.required && a.default.isEmpty && !mappedAttrs.contains(a.name) =>
        s"""Required field "${a.name}" is missing from CSV headers"""
    }
    val warnings = mappings.collect {
      case HeaderMapping.Invalid(h, reason) =>
        s"""Column "$h" does not match any field and will be ignored ($reason)"""
    }
    HeaderPlan(mappings, errors, warnings)
  }

  def resolve(header: String, ct: ContentType): HeaderMapping = {
    val trimmed = header.trim
    ct.attribute(trimmed) match {
      case Some(a) if a.isComponent =>
        // bare component header is not directly assignable (:190-192)
        HeaderMapping.Invalid(header, s"component field '$trimmed' requires dot notation")
      case Some(a) => HeaderMapping.Direct(header, a)
      case None if trimmed.contains(".") =>
        val first = trimmed.substring(0, trimmed.indexOf('.'))
        val rest = trimmed.substring(trimmed.indexOf('.') + 1)
        ct.attribute(first) match {
          case Some(a) if a.isRelation && !rest.contains(".") =>
            HeaderMapping.RelationSearch(header, a, rest)
          case Some(a) if a.isComponent =>
            HeaderMapping.ComponentPath(header, a, rest)
          case Some(_) =>
            HeaderMapping.Invalid(header, s"'$first' is not a relation or component")
          case None =>
            HeaderMapping.Invalid(header, s"unknown field '$first'")
        }
      case None => HeaderMapping.Invalid(header, s"unknown field '$trimmed'")
    }
  }

  /** Relation-target uniqueness pre-check: for each `relation.field` header
    * the target table must exist, the target field must exist, and should be
    * declared unique (warning otherwise)
    * (reference: validateRelationFieldUniqueness,
    * server/services/csv-import.js:292-357). Plan-time only; no data read.
    */
  def validateRelationTargets(plan: HeaderPlan, registry: ContentTypeRegistry): (Seq[String], Seq[String]) = {
    val errs = Seq.newBuilder[String]
    val warns = Seq.newBuilder[String]
    plan.valid.foreach {
      case HeaderMapping.RelationSearch(h, a, field) =>
        a.target.flatMap(registry.contentType) match {
          case None =>
            errs += s"""Relation target for "$h" does not exist"""
          case Some(target) =>
            target.attribute(field) match {
              case None =>
                errs += s"""Field "$field" does not exist on relation target "${target.uid}" (column "$h")"""
              case Some(tf) if !tf.unique && tf.name != "id" =>
                warns += s"""Field "$field" on "${target.uid}" is not unique; first match by id order will be used (column "$h")"""
              case Some(_) => ()
            }
        }
      case _ => ()
    }
    (errs.result(), warns.result())
  }
}
