package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Partition-layout discipline: a filter on a partition column must reach
  * the scan as a PARTITION filter (directory pruning — the scan never
  * opens non-matching files), not as a post-scan data filter. At 100 TB
  * this is the difference between reading one day and reading the lake.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("filter on partition column prunes at the scan") {
    val dir = "/tmp/graft_part_spec"
    (1 to 100).map(i => (i.toLong, s"d${i % 4}")).toDF("v", "day")
      .write.partitionBy("day").mode("overwrite").parquet(dir)

    val read = spark.read.parquet(dir).filter($"day" === "d1")
    val scan = read.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    scan.partitionFilters should not be empty
    // the pruned scan SELECTS exactly the one matching directory: every
    // file fed to the scan lives under day=d1 (inputFiles on the relation
    // would count the whole table — assert the selected partitions instead)
    val selectedFiles = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files.map(_.getPath.toString))
    selectedFiles should not be empty
    all(selectedFiles) should include("day=d1")
    read.count() shouldBe 25

    // and a non-partition filter must be pushed to parquet, not partition-pruned
    val dataRead = spark.read.parquet(dir).filter($"v" <= 10)
    val dataScan = dataRead.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    dataScan.metadata("PushedFilters") should include("LessThanOrEqual(v,10)")
  }
}
