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
  * Scale design: the common-field cascade is NOT executed as 6 sequential
  * joins. The target is unpivoted once into a long-format lookup frame
  * (priority, lowercased value, id) and the incoming values equi-join it in
  * ONE broadcast hash join; min(struct(priority, id)) per input row restores
  * the cascade's priority order. The CONTAINS fallback is a theta join that
  * only runs over still-unresolved rows and only when the target is under
  * `containsGuardRows` (it is O(rows × target) — at 100 TB it must stay a
  * dimension-side-only operation; above the guard it is skipped, matching
  * "miss ⇒ field dropped").
  */
object RelationResolver {

  /** Max target rows for which the contains-fallback theta join is allowed
    * (SURVEY §7.5.3). Dimension tables in the reference's domain are tiny;
    * this guard keeps the O(n×m) path from ever running against a fact-sized
    * target.
    */
  val containsGuardRows: Long = 1000000L

  private val RowKey = "__rr_key"

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
    val keyed = incoming.withColumn(RowKey, monotonically_increasing_id())
    val tgt = target.select(
      qcol(targetIdCol).cast("long").as("__tid"),
      lower(trim(qcol(searchField))).as("__tval"),
    )

    val exact = keyed
      .join(broadcast(tgt), lower(trim(qcol(valueCol))) === col("__tval"), "left")
      .groupBy(col(RowKey)).agg(min(col("__tid")).as("__exact"))

    val withExact = keyed.join(exact, RowKey)

    val resolved =
      if (!enableContains) withExact.withColumn(resolvedCol, col("__exact"))
      else {
        // contains fallback only for rows the equality join missed
        val misses = withExact.filter(col("__exact").isNull && !Casts.isMissing(qcol(valueCol)))
          .select(col(RowKey), lower(trim(qcol(valueCol))).as("__needle"))
        val contains = misses
          .join(broadcast(tgt), col("__tval").contains(col("__needle")), "left")
          .groupBy(col(RowKey)).agg(min(col("__tid")).as("__contains"))
        withExact
          .join(contains, Seq(RowKey), "left")
          .withColumn(resolvedCol, coalesce(col("__exact"), col("__contains")))
          .drop("__contains")
      }
    resolved.drop(RowKey, "__exact")
  }

  /** Build the long-format lookup frame for the bare-value cascade:
    * one row per (existing common field, value) with its priority.
    * Priority 0 is reserved for the id fallback handled separately.
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
  }

  /** Resolve a scalar relation column with NO explicit search field — the
    * fallback cascade (J2). Adds `resolvedCol: long`.
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
    val keyed = incoming.withColumn(RowKey, monotonically_increasing_id())

    // (a) numeric ⇒ id join (:556-565)
    val ids = target.select(qcol(targetIdCol).cast("long").as("__idv")).distinct()
    val byId = keyed
      .filter(Casts.isNumeric(qcol(valueCol)))
      .select(col(RowKey), trim(qcol(valueCol)).try_cast("long").as("__want"))
      .join(broadcast(ids), col("__want") === col("__idv"), "left")
      .groupBy(col(RowKey)).agg(min(col("__idv")).as("__byid"))

    // (b) one unpivoted broadcast join replaces the 6-join cascade
    val lookup = cascadeLookup(target, targetIdCol, commonFields)
    val byField = keyed
      .filter(!Casts.isNumeric(qcol(valueCol)) && !Casts.isMissing(qcol(valueCol)))
      .select(col(RowKey), lower(trim(qcol(valueCol))).as("__needle"))
      .join(broadcast(lookup), col("__needle") === col("__tval"), "left")
      .groupBy(col(RowKey))
      .agg(min(struct(col("__prio"), col("__tid"))).as("m"))
      .select(col(RowKey), col("m.__tid").as("__byfield"))

    val joined = keyed
      .join(byId, Seq(RowKey), "left")
      .join(byField, Seq(RowKey), "left")
      .withColumn("__resolved0", coalesce(col("__byid"), col("__byfield")))

    // (c) contains on the FIRST present common field only (:599-613)
    val result =
      if (!enableContains) joined.withColumn(resolvedCol, col("__resolved0"))
      else {
        val firstField = commonFields.find(target.columns.contains)
        firstField match {
          case None => joined.withColumn(resolvedCol, col("__resolved0"))
          case Some(f) =>
            val tgt1 = target.select(qcol(targetIdCol).cast("long").as("__tid"),
              lower(trim(col(f))).as("__tval"))
            val misses = joined
              .filter(col("__resolved0").isNull && !Casts.isMissing(qcol(valueCol)) && !Casts.isNumeric(qcol(valueCol)))
              .select(col(RowKey), lower(trim(qcol(valueCol))).as("__needle"))
            val contains = misses
              .join(broadcast(tgt1), col("__tval").contains(col("__needle")), "left")
              .groupBy(col(RowKey)).agg(min(col("__tid")).as("__contains"))
            joined.join(contains, Seq(RowKey), "left")
              .withColumn(resolvedCol, coalesce(col("__resolved0"), col("__contains")))
              .drop("__contains")
        }
      }
    result.drop(RowKey, "__byid", "__byfield", "__resolved0")
  }

  /** Resolve a multi-valued relation column (comma-separated values) with an
    * explicit search field (J3). Adds `resolvedCol: array<long>` preserving
    * element order; unresolvable elements are dropped (reference keeps only
    * found ids, :479-489); an all-miss list resolves to an empty array.
    */
  def resolveMultiByField(
      incoming: DataFrame,
      valueCol: String,
      target: DataFrame,
      targetIdCol: String,
      searchField: String,
      resolvedCol: String,
      enableContains: Boolean = true,
  ): DataFrame = {
    // outer key uses its own name: resolveByField generates RowKey internally
    val OuterKey = "__rr_okey"
    val keyed = incoming.withColumn(OuterKey, monotonically_increasing_id())
    val exploded = keyed
      .select(col(OuterKey), posexplode_outer(Casts.splitTrim(qcol(valueCol))).as(Seq("__pos", "__elem")))
    val resolved = resolveByField(exploded, "__elem", target, targetIdCol, searchField,
      "__rid", enableContains)
    val collected = resolved
      .groupBy(col(OuterKey))
      .agg(array_sort(collect_list(when(col("__rid").isNotNull,
        struct(col("__pos"), col("__rid"))))).as("arr"))
      // empty result ⇒ field dropped (null), matching the reference (:491)
      .select(col(OuterKey),
        when(size(col("arr")) > 0, transform(col("arr"), e => e("__rid"))).as(resolvedCol))
    keyed.join(collected, Seq(OuterKey), "left").drop(OuterKey)
  }
}
