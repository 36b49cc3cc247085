package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One persisted store a maintenance sweep owns: a display `name`, the
  * family (`"ann"` — any [[AnnIndex]] layout, routed by its stored
  * layout marker; `"text"` — inverted or positional [[TextIndex]];
  * `"dedup"` — a streaming signature store,
  * [[graft.streaming.DocStreams]]), and its directory.
  */
final case class StoreRef(name: String, kind: String, dir: String)

/** Fleet-wide compaction sweep — the ACTUATOR for the store-health
  * dashboards ([[AnnIndex.healthReport]], [[TextIndex.healthReport]],
  * [[graft.streaming.DocStreams.dedupStoreHealth]]): measure every
  * store's tombstone debt, compact the ones at or above the threshold
  * through their own family's rewrite, re-measure, and return one
  * report frame. This is the single maintenance-cadence entry point a
  * production pipeline schedules (nightly, or after takedown batches)
  * instead of remembering N per-store policies.
  *
  * Scale shape: measurement is one counter-sized aggregate per store
  * (the health-report scan); compaction cost is each family's own
  * live-row rewrite, paid only where debt crossed the threshold. The
  * driver holds one 9-field tuple per store — never rows.
  */
object StoreMaintenance {

  private val kinds = Set("ann", "text", "dedup")

  /** (total rows, live rows, debt) via the store family's own
    * health-report measurement — the same numbers the dashboards serve.
    */
  private def health(spark: SparkSession,
      ref: StoreRef): (Long, Long, Double) = {
    val df = ref.kind match {
      case "ann"  => AnnIndex.healthReport(spark, Seq(ref.name -> ref.dir))
      case "text" => TextIndex.healthReport(spark, Seq(ref.name -> ref.dir))
      case "dedup" =>
        graft.streaming.DocStreams.dedupStoreHealth(spark, ref.name, ref.dir)
    }
    val r = df.select(col("total_rows"), col("live_rows"),
      col("tombstone_debt")).head()
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  /** Sweep the fleet: per store, debt at or above `threshold` routes to
    * that family's compaction ([[AnnIndex.compactIfNeeded]] /
    * [[TextIndex.compactIfNeeded]] /
    * [[graft.streaming.DocStreams.compactDedupStore]]); the report row
    * carries before/after counts so the caller can both audit the
    * decision (debt_before vs threshold) and verify the rewrite did its
    * job (total_after == live_before, debt_after == 0 for every
    * compacted store). Same caller contract as each per-store policy:
    * serialize the sweep against appends/streams on the same stores.
    * The degenerate fully-tombstoned store still refuses to compact
    * (each family's requireLive guard) — a rebuild-or-drop decision the
    * sweep propagates loudly rather than masking.
    */
  def sweep(spark: SparkSession, stores: Seq[StoreRef],
      threshold: Double = 0.25): DataFrame = {
    require(stores.nonEmpty, "no stores to sweep")
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1]: $threshold")
    val bad = stores.filterNot(s => kinds(s.kind))
    require(bad.isEmpty,
      s"unknown store kind(s): ${bad.map(s => s"${s.name}=${s.kind}").mkString(", ")}")
    require(stores.map(_.name).distinct.size == stores.size,
      "duplicate store names in sweep")
    stores.map { ref =>
      val (tb, lb, db) = health(spark, ref)
      val compacted = ref.kind match {
        case "ann"  => AnnIndex.compactIfNeeded(spark, ref.dir, threshold)
        case "text" => TextIndex.compactIfNeeded(spark, ref.dir, threshold)
        case "dedup" =>
          if (db >= threshold) {
            graft.streaming.DocStreams.compactDedupStore(spark, ref.dir)
            true
          } else false
      }
      val (ta, la, da) = if (compacted) health(spark, ref) else (tb, lb, db)
      spark.range(1).select(
        lit(ref.name).as("store"), lit(ref.kind).as("kind"),
        lit(tb).as("total_before"), lit(lb).as("live_before"),
        lit(db).as("debt_before"), lit(compacted).as("compacted"),
        lit(ta).as("total_after"), lit(la).as("live_after"),
        lit(da).as("debt_after"))
    }.reduce(_ unionByName _)
  }
}
