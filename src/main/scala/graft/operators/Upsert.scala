package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Batched load with optional upsert (find-by-key → update-else-create) and
  * per-row result accounting.
  *
  * Ports `importData` (reference: server/services/csv-import.js:362-409):
  * the reference issues 1-2 DB round-trips per row; here the whole batch is
  * one MERGE-emulation over Parquet:
  *
  *   merged = target ANTI-JOIN incoming (by key)  ∪  incoming
  *
  * Within-batch duplicate keys: the reference processes rows sequentially so
  * the LAST occurrence wins; emulated with row_number over input order
  * descending (SURVEY §7.5.5).
  *
  * Counters (`created`/`updated`, reference :364-368) come from an
  * `observe()` over the key join inside the merged plan — collected as a
  * side effect of the caller's action, no extra job, no driver iteration.
  *
  * Physical write is rewrite-and-swap (plain Parquet has no MERGE): write
  * merged to a temp dir, atomically move into place. At cluster scale this
  * is the same pattern as a Delta/Iceberg overwrite commit minus the
  * transaction log — a known, documented trade-off.
  */
object Upsert {

  /** Merge output with LAZY counters: `created`/`updated` are collected by
    * an `observe()` node inside `merged`'s plan, so the caller's FIRST
    * action on `merged` (a write, a count, …) populates them for free —
    * importCsv + write is ONE execution of the whole pipeline, not a
    * counter job plus a replay. Reading a counter before any action has
    * run triggers one no-op materialization as a fallback.
    */
  final class MergeResult(
      val merged: DataFrame,
      obs: org.apache.spark.sql.Observation) {
    // positional access: metric 0 = created, 1 = updated (as passed to
    // observe). Observation.getOrEmpty/get NPE on the schema-less fallback
    // row in 4.1.2 — getRowOrEmpty/getRow are the safe surface.
    private lazy val metrics: org.apache.spark.sql.Row =
      org.apache.spark.sql.GraftSqlBridge.observationRow(obs).getOrElse {
        merged.write.format("noop").mode("overwrite").save()
        org.apache.spark.sql.GraftSqlBridge.observationRowBlocking(obs)
      }
    def created: Long = metrics.getLong(0)
    def updated: Long = metrics.getLong(1)
  }

  private val OrderCol = "__ins_order"

  /** Deduplicate incoming rows by key, last occurrence wins. Hash-aggregate
    * max-by (the input-order id is the struct's leading field) instead of a
    * window: partial aggregation map-side, no per-partition sort.
    */
  def dedupLastWins(incoming: DataFrame, key: String): DataFrame = {
    val others = incoming.columns.filterNot(_ == key)
    incoming
      .withColumn(OrderCol, monotonically_increasing_id())
      .groupBy(col(key))
      .agg(max(struct(col(OrderCol) +: others.map(col): _*)).as("__m"))
      .select(col(key) +: others.map(c => col("__m").getField(c).as(c)): _*)
      // restore original column order
      .select(incoming.columns.map(col): _*)
  }

  /** Pure merge: returns the merged frame plus created/updated counts.
    * `upsert=false` reproduces plain insert (every incoming row appended,
    * created = incoming count, reference :391-397).
    */
  def merge(target: DataFrame, incoming: DataFrame, key: String, upsert: Boolean): MergeResult = {
    val obs = org.apache.spark.sql.Observation()
    if (!upsert) {
      // counters ride the union's incoming branch — no separate count job
      val inc = incoming.observe(obs,
        count(lit(1)).as("created"), lit(0L).as("updated"))
      new MergeResult(target.unionByName(inc, allowMissingColumns = true), obs)
    } else {
      // The deduped frame feeds BOTH the anti-join probe and the union
      // branch. No cache: both branches shuffle the identical child on the
      // same key, so ReuseExchange materializes the heavy upstream
      // (scan → validate → resolve → partial agg) once per action.
      val deduped = dedupLastWins(incoming, key)
      // counters ride the union's incoming branch as a left join against
      // the DISTINCT target keys (duplicate target keys count once):
      // created = no key hit, updated = key hit
      val keys = target.select(col(key)).distinct().withColumn("__ex", lit(1))
      val inc = deduped.join(keys, Seq(key), "left")
        .observe(obs,
          count(when(col("__ex").isNull, 1)).as("created"),
          count(col("__ex")).as("updated"))
        .drop("__ex")
      val kept = target.join(deduped.select(col(key)), Seq(key), "left_anti")
      new MergeResult(kept.unionByName(inc, allowMissingColumns = true), obs)
    }
  }

  /** Rewrite-and-swap write of a merged table directory. */
  def writeSwap(spark: SparkSession, merged: DataFrame, tableDir: String): Unit = {
    val tmp = tableDir + ".tmp-" + System.nanoTime()
    merged.write.mode("overwrite").parquet(tmp)
    val dir = Paths.get(tableDir)
    val bak = Paths.get(tableDir + ".bak")
    if (Files.exists(dir)) {
      Files.move(dir, bak, StandardCopyOption.ATOMIC_MOVE)
    }
    Files.move(Paths.get(tmp), dir, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(bak)) {
      // best-effort cleanup of the previous generation
      import scala.jdk.CollectionConverters._
      Files.walk(bak).iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
    }
  }
}
