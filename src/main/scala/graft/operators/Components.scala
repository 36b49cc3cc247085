package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Casts
import graft.functions.Cols.qcol
import graft.registry.{Attribute, AttrKind, ComponentType, ContentTypeRegistry}

/** Nested-structure assembly: builds (arrays of) structs from flattened
  * dot-notation CSV columns.
  *
  * Ports `processComponents`/`parseComponentRows`/`convertComponentFieldValue`
  * (reference: server/services/csv-import.js:625-737, :774-803):
  *   - single component: one struct from its `component.sub` columns; if every
  *     sub-value is empty the component is null (:768).
  *   - repeatable component: every stashed column is comma-split;
  *     `maxRows = max(list length)` (:707-714); struct row i takes element i
  *     of each list (missing ⇒ null — the reference omits the key, structs
  *     can't, see SURVEY §7.5.4); all-empty rows are dropped (:717-735).
  *   - relations inside components (`component.rel.field` grammar, :749-761)
  *     are resolved through RelationResolver on the exploded elements (J5).
  *
  * Scale: assembly is purely columnar (split/arrays_zip/transform — all
  * codegen'd); only inner-relation resolution joins, and those are broadcast
  * lookups on exploded elements.
  */
object Components {

  /** Spec for one component attribute's source columns: map of
    * componentField-path → CSV column name. Paths with a dot are inner
    * relations (`rel.searchField`).
    */
  final case class ComponentSource(
      attr: Attribute,
      component: ComponentType,
      /** componentField path (e.g. "city" or "country.name") → source column */
      columns: Map[String, String],
  )

  def sourcesFromPlan(plan: HeaderPlan, registry: ContentTypeRegistry): Seq[ComponentSource] = {
    val byAttr = plan.valid.collect {
      case HeaderMapping.ComponentPath(h, a, path) => (a, path, h)
    }.groupBy(_._1.name)
    byAttr.values.toSeq.map { group =>
      val attr = group.head._1
      val comp = registry.componentOrThrow(attr.component.get)
      ComponentSource(attr, comp, group.map { case (_, path, h) => path -> h }.toMap)
    }
  }

  /** Inner-relation resolution plan hook: given (df, valueCol, targetUid,
    * searchField, outCol) produce df with outCol resolved. Injected so this
    * module doesn't need to know where target tables live.
    */
  type RelationLookup = (DataFrame, String, String, String, String) => DataFrame

  /** Assemble one component attribute into its struct / array-of-structs
    * column, dropping the source columns.
    */
  def assemble(
      df: DataFrame,
      src: ComponentSource,
      lookup: RelationLookup,
  ): DataFrame = {
    if (src.attr.repeatable) assembleRepeatable(df, src, lookup)
    else assembleSingle(df, src, lookup)
  }

  /** Field-path → (componentAttr, optional searchField). */
  private def fieldOf(src: ComponentSource, path: String): (Attribute, Option[String]) = {
    if (path.contains(".")) {
      val field = path.substring(0, path.indexOf('.'))
      val search = path.substring(path.indexOf('.') + 1)
      val a = src.component.attribute(field).getOrElse(
        throw new NoSuchElementException(s"component ${src.component.uid} has no field $field"))
      (a, Some(search))
    } else {
      val a = src.component.attribute(path).getOrElse(
        throw new NoSuchElementException(s"component ${src.component.uid} has no field $path"))
      (a, None)
    }
  }

  private def assembleSingle(df0: DataFrame, src: ComponentSource, lookup: RelationLookup): DataFrame = {
    var df = df0
    // resolve inner relations first: scalar value columns → resolved id cols
    val resolvedCols: Map[String, Column] = src.columns.map { case (path, csvCol) =>
      val (fieldAttr, search) = fieldOf(src, path)
      if (fieldAttr.isRelation) {
        val out = s"__comp_${src.attr.name}_${fieldAttr.name}"
        df = lookup(df, csvCol, fieldAttr.target.get, search.getOrElse("name"), out)
        fieldAttr.name -> col(out).cast("long")
      } else {
        fieldAttr.name -> Casts.castForAttribute(qcol(csvCol), fieldAttr)
      }
    }
    val fields = resolvedCols.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }
    val anyPresent = resolvedCols.values
      .map(_.isNotNull)
      .reduceOption(_ || _).getOrElse(lit(false))
    // all-empty ⇒ null component (reference :768)
    val assembled = df.withColumn(src.attr.name,
      when(anyPresent, struct(fields: _*)))
    assembled.drop((src.columns.values.toSeq ++ resolvedCols.keys.map(k => s"__comp_${src.attr.name}_$k")): _*)
  }

  private def assembleRepeatable(df0: DataFrame, src: ComponentSource, lookup: RelationLookup): DataFrame = {
    val rowKey = s"__comp_${src.attr.name}_key"
    val originals = df0.columns
    val df = df0.withColumn(rowKey, monotonically_increasing_id())

    // comma-split each stashed column (reference :707-714); element i of
    // each list forms struct i; arrays_zip pads ragged lists with null,
    // matching the reference's "missing ⇒ absent" (as null)
    val pathSeq = src.columns.toSeq.sortBy(_._1)
    val splitCols = pathSeq.map { case (path, csvCol) =>
      split(qcol(csvCol), ",").as(s"__sp_$path")
    }
    val zipped = arrays_zip(splitCols: _*)

    // explode to element rows CARRYING all original columns — the chain
    // stays linear through the groupBy (no row-key join-back: synthetic ids
    // are not stable across plan branches)
    val exploded = df
      .select(col(rowKey) +: originals.map(qcol) :+
        posexplode_outer(zipped).as(Seq("__pos", "__elem")): _*)
      .select(col(rowKey) +: col("__pos") +: originals.map(qcol) :++
        pathSeq.zipWithIndex.map { case ((path, _), i) =>
          trim(col("__elem").getField(s"__sp_$path")).as(s"__v$i")
        }: _*)

    var resolved = exploded
    val fieldCols: Seq[(String, Column)] = pathSeq.zipWithIndex.map { case ((path, _), i) =>
      val (fieldAttr, search) = fieldOf(src, path)
      if (fieldAttr.isRelation) {
        val out = s"__rid$i"
        resolved = lookup(resolved, s"__v$i", fieldAttr.target.get, search.getOrElse("name"), out)
        fieldAttr.name -> col(out).cast("long")
      } else {
        fieldAttr.name -> Casts.castForAttribute(col(s"__v$i"), fieldAttr)
      }
    }
    val structFields = fieldCols.sortBy(_._1).map { case (n, c) => c.as(n) }
    // all-empty element rows are skipped via the null-skipping collect
    // (reference :717-735) — NOT a pre-filter, which would drop rows whose
    // every element is empty instead of giving them a null component
    val anyPresent = fieldCols.map(_._2.isNotNull).reduceOption(_ || _).getOrElse(lit(false))

    resolved
      .groupBy(col(rowKey))
      .agg(
        first(struct(originals.map(qcol): _*)).as("__orig"),
        array_sort(collect_list(when(anyPresent, struct(col("__pos").as("__pos"),
          struct(structFields: _*).as("__s"))))).as("__arr"))
      .select(originals.map(c => col("__orig").getField(c).as(c)) :+
        when(size(col("__arr")) > 0, transform(col("__arr"), e => e("__s"))).as(src.attr.name): _*)
      .drop(src.columns.values.toSeq: _*)
  }
}
