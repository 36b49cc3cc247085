package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Casts
import graft.functions.Cols.qcol
import graft.registry.ContentTypeRegistry

/** Lookup-join planner: turns the reference's per-row N+1 relation lookups
  * (reference: findRelatedEntity, server/services/csv-import.js:521-620;
  * processRelations :433-513) into set-oriented broadcast joins.
  *
  * Semantics preserved:
  *   - explicit search field (`country.name` header): case-insensitive
  *     equality first (:529-534), case-insensitive CONTAINS fallback
  *     (:541-553), first match wins (`limit 1`).
  *   - bare value: numeric ⇒ id lookup (:556-565); else case-insensitive
  *     equality against each existing "common field" in priority order
  *     name,title,slug,displayName,label,country (:574-597); else CONTAINS
  *     on the first common field (:599-613).
  *   - multi relations: comma-split, each element resolved, ids collected in
  *     input order (:475-493).
  *   - unresolved ⇒ null (the reference drops the field from the row).
  *
  * Deterministic deviation (documented, SURVEY §7.5.2): the reference's
  * `limit 1` is order-undefined; we take the match with the lowest
  * (priority, id). Oracle SQL mirrors that.
  *
  * Scale design — the fact side NEVER shuffles on the happy path:
  *   - ambiguity (duplicate lookup values) is resolved by pre-aggregating
  *     the DIMENSION to one row per value (min id / min (priority, id)),
  *     so the equality lookups are plain broadcast hash joins over the
  *     incoming frame — map-side only, whole-stage codegen.
  *   - the 6-field fallback cascade is ONE join against an unpivoted
  *     (value → best (priority, id)) frame, not six sequential joins.
  *   - only the CONTAINS fallback (a theta join) touches a row key, and it
  *     runs exclusively over equality MISSES (usually a tiny fraction), and
  *     only when the target is dimension-sized (`containsGuardRows` —
  *     O(misses × target) must never run against a fact-sized target).
  */
object RelationResolver {

  /** Max target rows for which the contains-fallback theta join is allowed
    * (SURVEY §7.5.3). Above the guard the fallback is skipped, matching
    * "miss ⇒ field dropped".
    */
  val containsGuardRows: Long = 1000000L

  /** Dimension side of the explicit-field lookup: one row per lowercased
    * value, lowest id wins (deterministic `limit 1`).
    */
  private def fieldLookup(target: DataFrame, targetIdCol: String, searchField: String): DataFrame =
    target
      .select(qcol(targetIdCol).cast("long").as("__tid"),
        lower(trim(qcol(searchField))).as("__tval"))
      .filter(col("__tval").isNotNull)
      .groupBy(col("__tval")).agg(min(col("__tid")).as("__tid"))

  /** CONTAINS fallback as a VALUE-keyed lookup: the contains result depends
    * only on the needle value, so the theta join runs over DISTINCT miss
    * values and the result equi-joins back by value. No per-row key exists
    * anywhere — row keys (monotonically_increasing_id) are NOT stable
    * across plan branches (AQE may plan each branch differently), and a
    * join-back on them can mispair rows.
    */
  private def containsLookup(
      missValues: DataFrame, // (__needle) distinct
      target: DataFrame, targetIdCol: String, searchField: String,
  ): DataFrame = {
    val tgt = target.select(qcol(targetIdCol).cast("long").as("__tid"),
      lower(trim(qcol(searchField))).as("__cval"))
    missValues
      .join(broadcast(tgt), col("__cval").contains(col("__needle")))
      .groupBy(col("__needle")).agg(min(col("__tid")).as("__contains"))
  }

  /** Resolve a scalar relation column with an explicit search field.
    * Adds `resolvedCol: long` (null = no match) to `incoming`.
    *
    * J1 (SURVEY §2.4): eqi equi-join, containsi fallback, min(id) tie-break.
    */
  def resolveByField(
      incoming: DataFrame,
      valueCol: String,
      target: DataFrame,
      targetIdCol: String,
      searchField: String,
      resolvedCol: String,
      enableContains: Boolean = true,
  ): DataFrame = {
    val lookup = fieldLookup(target, targetIdCol, searchField)
    val exact = incoming
      .join(broadcast(lookup), lower(trim(qcol(valueCol))) === col("__tval"), "left")
      .withColumn(resolvedCol, col("__tid"))
      .drop("__tval", "__tid")
    if (!enableContains) exact
    else {
      val missValues = exact
        .filter(col(resolvedCol).isNull && !Casts.isMissing(qcol(valueCol)))
        .select(lower(trim(qcol(valueCol))).as("__needle")).distinct()
      val contains = containsLookup(missValues, target, targetIdCol, searchField)
      exact.join(broadcast(contains),
          lower(trim(qcol(valueCol))) === col("__needle") && col(resolvedCol).isNull, "left")
        .withColumn(resolvedCol, coalesce(col(resolvedCol), col("__contains")))
        .drop("__needle", "__contains")
    }
  }

  /** Dimension side of the bare-value cascade: one row per lowercased value
    * across all present common fields, best (priority, id) wins.
    */
  private def cascadeLookup(target: DataFrame, targetIdCol: String, commonFields: Seq[String]): DataFrame = {
    val present = commonFields.zipWithIndex.collect {
      case (f, i) if target.columns.contains(f) =>
        struct(lit(i + 1).as("prio"), lower(trim(col(f))).as("v"))
    }
    require(present.nonEmpty, s"target has none of the common lookup fields: ${commonFields.mkString(",")}")
    target
      .select(qcol(targetIdCol).cast("long").as("__tid"), explode(array(present: _*)).as("e"))
      .select(col("__tid"), col("e.prio").as("__prio"), col("e.v").as("__tval"))
      .filter(col("__tval").isNotNull && col("__tval") =!= "")
      .groupBy(col("__tval"))
      .agg(min(struct(col("__prio"), col("__tid"))).as("m"))
      .select(col("__tval"), col("m").getField("__tid").as("__ftid"))
  }

  /** Resolve a scalar relation column with NO explicit search field — the
    * fallback cascade (J2). Adds `resolvedCol: long`.
    *
    * Two broadcast joins over the incoming frame (id lookup + unpivoted
    * value lookup), coalesced in reference priority order; non-numeric
    * values simply miss the id join (null ⇒ falls through).
    */
  def resolveBare(
      incoming: DataFrame,
      valueCol: String,
      target: DataFrame,
      targetIdCol: String,
      resolvedCol: String,
      commonFields: Seq[String] = ContentTypeRegistry.commonLookupFields,
      enableContains: Boolean = true,
  ): DataFrame = {
    // (a) numeric ⇒ id join (:556-565); ids are unique, no pre-agg needed
    val ids = target.select(qcol(targetIdCol).cast("long").as("__idv")).distinct()
    // (b) unpivoted common-field lookup (:574-597)
    val lookup = cascadeLookup(target, targetIdCol, commonFields)

    val joined = incoming
      .join(broadcast(ids), trim(qcol(valueCol)).try_cast("long") === col("__idv"), "left")
      .join(broadcast(lookup), lower(trim(qcol(valueCol))) === col("__tval"), "left")
      .withColumn(resolvedCol, coalesce(col("__idv"), col("__ftid")))
      .drop("__idv", "__tval", "__ftid")

    // (c) contains on the FIRST present common field only (:599-613),
    // value-keyed (see containsLookup)
    val firstField = if (enableContains) commonFields.find(target.columns.contains) else None
    firstField match {
      case None => joined
      case Some(f) =>
        val missValues = joined
          .filter(col(resolvedCol).isNull && !Casts.isMissing(qcol(valueCol)) &&
            !Casts.isNumeric(qcol(valueCol)))
          .select(lower(trim(qcol(valueCol))).as("__needle")).distinct()
        val contains = containsLookup(missValues, target, targetIdCol, f)
        joined.join(broadcast(contains),
            lower(trim(qcol(valueCol))) === col("__needle") && col(resolvedCol).isNull, "left")
          .withColumn(resolvedCol, coalesce(col(resolvedCol), col("__contains")))
          .drop("__needle", "__contains")
    }
  }

  /** Resolve a multi-valued relation column (comma-separated values) with an
    * explicit search field (J3). Adds `resolvedCol: array<long>` preserving
    * element order; unresolvable elements are dropped (reference keeps only
    * found ids, :479-489); an all-miss list resolves to null ("field
    * dropped", :491).
    *
    * The equality path avoids exploding: each element of the split array is
    * resolved via a broadcast map lookup (element_at on a map literal is
    * not scalable — instead the exploded join regroups by a row key; the
    * dimension is still pre-aggregated so the join itself never multiplies
    * rows).
    */
  /** Shared multi-value chain: explode, resolve each element via
    * `resolveElem`, regroup. All original columns are CARRIED THROUGH the
    * explode (first() restores them after the groupBy) — a single linear
    * plan, never a row-key join-back (monotonically_increasing_id is not
    * stable across plan branches).
    */
  private def resolveMulti(
      incoming: DataFrame,
      valueCol: String,
      resolvedCol: String,
      resolveElem: DataFrame => DataFrame,
  ): DataFrame = {
    val OuterKey = "__rr_okey"
    val originals = incoming.columns
    val keyed = incoming.withColumn(OuterKey, monotonically_increasing_id())
    val exploded = keyed
      .select(col(OuterKey) +: originals.map(qcol) :+
        posexplode_outer(Casts.splitTrim(qcol(valueCol))).as(Seq("__pos", "__elem")): _*)
    val resolved = resolveElem(exploded)
    resolved
      .groupBy(col(OuterKey))
      .agg(
        first(struct(originals.map(qcol): _*)).as("__orig"),
        array_sort(collect_list(when(col("__rid").isNotNull,
          struct(col("__pos"), col("__rid"))))).as("arr"))
      // empty result ⇒ field dropped (null), matching the reference (:491)
      .select(originals.map(c => col("__orig").getField(c).as(c)) :+
        when(size(col("arr")) > 0, transform(col("arr"), e => e("__rid"))).as(resolvedCol): _*)
  }

  def resolveMultiByField(
      incoming: DataFrame,
      valueCol: String,
      target: DataFrame,
      targetIdCol: String,
      searchField: String,
      resolvedCol: String,
      enableContains: Boolean = true,
  ): DataFrame =
    resolveMulti(incoming, valueCol, resolvedCol,
      ex => resolveByField(ex, "__elem", target, targetIdCol, searchField, "__rid", enableContains))

  /** Multi-valued relation with NO explicit search field: comma-split, each
    * element resolved through the J2 cascade (reference: processRelations
    * :475-493 routes every element through findRelatedEntity).
    */
  def resolveMultiBare(
      incoming: DataFrame,
      valueCol: String,
      target: DataFrame,
      targetIdCol: String,
      resolvedCol: String,
      commonFields: Seq[String] = ContentTypeRegistry.commonLookupFields,
      enableContains: Boolean = true,
  ): DataFrame =
    resolveMulti(incoming, valueCol, resolvedCol,
      ex => resolveBare(ex, "__elem", target, targetIdCol, "__rid", commonFields, enableContains))
}
