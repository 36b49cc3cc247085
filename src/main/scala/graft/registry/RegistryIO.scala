package graft.registry

import org.apache.spark.sql.SparkSession

/** JSON persistence for the content-type catalog — the dynamic-schema
  * registry survives across sessions the way the reference's catalog lives
  * in the Strapi runtime (SURVEY §1.3, §7.2 M0). Serialized with Spark's
  * own JSON source (typed Dataset of rows), no extra dependencies.
  */
object RegistryIO {

  /** Serialized attribute — `Attribute.default` can't be an encoder field
    * name (Java keyword), hence the mirror.
    */
  final case class AttrRow(
      name: String, kind: String, required: Boolean, unique: Boolean,
      defaultValue: Option[String], enumValues: Seq[String],
      target: Option[String], relationKind: Option[String],
      component: Option[String], repeatable: Boolean) {
    def toAttribute: Attribute = Attribute(name, kind, required, unique,
      defaultValue, Option(enumValues).getOrElse(Nil), target, relationKind,
      component, repeatable)
  }
  private def row(a: Attribute) = AttrRow(a.name, a.kind, a.required, a.unique,
    a.default, a.enumValues, a.target, a.relationKind, a.component, a.repeatable)

  /** One catalog entry; kind ∈ {contentType, component}. */
  final case class CatalogRow(
      kind: String,
      uid: String,
      displayName: String,
      attributes: Seq[AttrRow],
  )

  def save(spark: SparkSession, registry: ContentTypeRegistry, path: String): Unit = {
    import spark.implicits._
    val rows =
      registry.contentTypes.values.toSeq.sortBy(_.uid)
        .map(ct => CatalogRow("contentType", ct.uid, ct.displayName, ct.attributes.map(row))) ++
      registry.components.values.toSeq.sortBy(_.uid)
        .map(c => CatalogRow("component", c.uid, "", c.attributes.map(row)))
    rows.toDS().coalesce(1).write.mode("overwrite").json(path)
  }

  def load(spark: SparkSession, path: String): ContentTypeRegistry = {
    import spark.implicits._
    val rows = spark.read
      .schema(implicitly[org.apache.spark.sql.Encoder[CatalogRow]].schema)
      .json(path).as[CatalogRow].collect()
    ContentTypeRegistry(
      rows.filter(_.kind == "contentType").toSeq
        .map(r => ContentType(r.uid, r.displayName, r.attributes.map(_.toAttribute))),
      rows.filter(_.kind == "component").toSeq
        .map(r => ComponentType(r.uid, r.attributes.map(_.toAttribute))),
    )
  }
}
