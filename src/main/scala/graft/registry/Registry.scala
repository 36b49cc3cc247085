package graft.registry

import org.apache.spark.sql.types._

/** Attribute kinds supported by the dynamic schema system.
  *
  * Mirrors the attribute vocabulary exercised by the reference's validator
  * (reference: server/services/csv-import.js:127-197) and component caster
  * (server/services/csv-import.js:774-803). See SURVEY.md §1.2 for the full
  * type-mapping table.
  */
object AttrKind {
  val StringK = "string"
  val TextK = "text"
  val IntegerK = "integer"
  val BigIntegerK = "biginteger"
  val DecimalK = "decimal"
  val FloatK = "float"
  val BooleanK = "boolean"
  val DateK = "date"
  val DateTimeK = "datetime"
  val TimeK = "time"
  val EmailK = "email"
  val EnumerationK = "enumeration"
  val RelationK = "relation"
  val ComponentK = "component"
  val MediaK = "media"

  val all: Set[String] = Set(StringK, TextK, IntegerK, BigIntegerK, DecimalK,
    FloatK, BooleanK, DateK, DateTimeK, TimeK, EmailK, EnumerationK,
    RelationK, ComponentK, MediaK)

  /** Spark storage type for a scalar attribute kind. Relations/components/
    * media are resolved structurally (see ContentType.sparkType).
    */
  def sparkType(kind: String): DataType = kind match {
    case IntegerK              => IntegerType
    case BigIntegerK           => LongType
    case DecimalK | FloatK     => DoubleType
    case BooleanK              => BooleanType
    case DateK | DateTimeK | TimeK => TimestampType
    case _                     => StringType // string/text/email/enumeration
  }
}

/** One column of a content type, with the constraint metadata the reference
  * keeps on Strapi attributes (required/default/unique/enum/relation/
  * component; reference: tests/helpers/setup.js:6-24,
  * server/services/csv-import.js:62-65,178,341-348,462,651).
  */
final case class Attribute(
    name: String,
    kind: String,
    required: Boolean = false,
    unique: Boolean = false,
    default: Option[String] = None,
    enumValues: Seq[String] = Nil,
    /** relation target content-type uid */
    target: Option[String] = None,
    /** oneToOne | manyToOne | oneToMany | manyToMany */
    relationKind: Option[String] = None,
    /** component uid for kind=component */
    component: Option[String] = None,
    repeatable: Boolean = false,
) {
  def isRelation: Boolean = kind == AttrKind.RelationK
  def isComponent: Boolean = kind == AttrKind.ComponentK
  def isMedia: Boolean = kind == AttrKind.MediaK

  /** Multi-valued relation (resolves to an id array).
    * Reference: server/services/csv-import.js:462-493.
    */
  def isMultiRelation: Boolean =
    isRelation && relationKind.exists(k => k == "oneToMany" || k == "manyToMany")
}

/** A named, dynamically-registered table (Strapi "content type").
  * Reference: server/services/csv-import.js:10-30 (getContentTypes).
  */
final case class ContentType(
    uid: String,
    displayName: String,
    attributes: Seq[Attribute],
) {
  def attribute(name: String): Option[Attribute] = attributes.find(_.name == name)

  /** Spark schema for the stored table: relations become id columns, media
    * becomes id arrays, components become (arrays of) structs. An `id`
    * column is always present (the reference's entity id).
    */
  def sparkType(registry: ContentTypeRegistry): StructType = {
    val fields = attributes.map { a =>
      val dt: DataType =
        if (a.isMedia) ArrayType(LongType)
        else if (a.isRelation) {
          if (a.isMultiRelation) ArrayType(LongType) else LongType
        } else if (a.isComponent) {
          val comp = registry.componentOrThrow(a.component.getOrElse(
            throw new IllegalArgumentException(s"component attribute ${a.name} missing component uid")))
          val st = comp.sparkStruct(registry)
          if (a.repeatable) ArrayType(st) else st
        } else AttrKind.sparkType(a.kind)
      StructField(a.name, dt, nullable = !a.required)
    }
    StructType(StructField("id", LongType, nullable = false) +: fields)
  }
}

/** A reusable nested struct schema (Strapi "component"); may itself contain
  * relations. Reference: server/services/csv-import.js:625-694, catalog at
  * :642 (strapi.components).
  */
final case class ComponentType(uid: String, attributes: Seq[Attribute]) {
  def attribute(name: String): Option[Attribute] = attributes.find(_.name == name)

  def sparkStruct(registry: ContentTypeRegistry): StructType =
    StructType(attributes.map { a =>
      val dt: DataType =
        if (a.isRelation) { if (a.isMultiRelation) ArrayType(LongType) else LongType }
        else AttrKind.sparkType(a.kind)
      StructField(a.name, dt, nullable = true)
    })
}

/** Global catalog of content types + components, playing the role of
  * `strapi.contentTypes` / `strapi.components`
  * (reference: server/services/csv-import.js:10-30, :642).
  *
  * Only uids in the `api::` namespace are user-importable — internal
  * (`admin::`, `plugin::`) types are filtered out, matching the reference's
  * `getContentTypes`.
  */
final class ContentTypeRegistry(
    val contentTypes: Map[String, ContentType],
    val components: Map[String, ComponentType],
) {
  /** Importable tables: the `api::` namespace only
    * (reference: server/services/csv-import.js:14).
    */
  def importable: Map[String, ContentType] =
    contentTypes.filter { case (uid, _) => uid.startsWith("api::") }

  def contentType(uid: String): Option[ContentType] = contentTypes.get(uid)
  def contentTypeOrThrow(uid: String): ContentType =
    contentTypes.getOrElse(uid, throw new NoSuchElementException(s"unknown content type: $uid"))

  def componentOrThrow(uid: String): ComponentType =
    components.getOrElse(uid, throw new NoSuchElementException(s"unknown component: $uid"))

  def withContentType(ct: ContentType): ContentTypeRegistry =
    new ContentTypeRegistry(contentTypes + (ct.uid -> ct), components)
}

object ContentTypeRegistry {
  val empty = new ContentTypeRegistry(Map.empty, Map.empty)

  def apply(types: Seq[ContentType], comps: Seq[ComponentType] = Nil): ContentTypeRegistry =
    new ContentTypeRegistry(types.map(t => t.uid -> t).toMap, comps.map(c => c.uid -> c).toMap)

  /** Ordered list of "common fields" tried by the bare-value relation
    * fallback cascade (reference: server/services/csv-import.js:574-597).
    */
  val commonLookupFields: Seq[String] =
    Seq("name", "title", "slug", "displayName", "label", "country")
}
