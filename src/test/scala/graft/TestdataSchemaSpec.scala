package graft

import org.apache.spark.sql.types._

/** Guards against driver-testdata schema drift: round 9 lost 16 driver
  * correctness rows because events.parquet's `ts` silently changed from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) between rounds. Read every
  * sf0.001 table through its `Tables` loader and assert the normalized
  * Spark schema, so the next drift fails here instead of in the driver.
  */
class TestdataSchemaSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def hasTestdata = new java.io.File(dir).isDirectory

  private def fields(name: String, df: org.apache.spark.sql.DataFrame): Seq[(String, DataType)] =
    df.schema.fields.toSeq.map(f => (f.name, f.dataType))

  test("testdata loader schemas are pinned") {
    assume(hasTestdata, s"$dir not present")
    val s = spark

    fields("region", Tables.region(s, dir)) shouldBe Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType)
    fields("nation", Tables.nation(s, dir)) shouldBe Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType)
    fields("customer", Tables.customer(s, dir)) shouldBe Seq(
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    fields("supplier", Tables.supplier(s, dir)) shouldBe Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType)
    fields("part", Tables.part(s, dir)) shouldBe Seq(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType)

    val orders = fields("orders", Tables.orders(s, dir)).toMap
    orders.keySet shouldBe Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    orders("o_orderkey") shouldBe LongType
    orders("o_totalprice") shouldBe DoubleType
    // o_orderdate: any timestamp flavor is fine for current queries
    assert(orders("o_orderdate") == TimestampType || orders("o_orderdate") == TimestampNTZType,
      s"o_orderdate drifted to ${orders("o_orderdate")}")

    val li = fields("lineitem", Tables.lineitem(s, dir)).toMap
    li.keySet shouldBe Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    li("l_quantity") shouldBe DoubleType
    assert(li("l_shipdate") == TimestampType || li("l_shipdate") == TimestampNTZType,
      s"l_shipdate drifted to ${li("l_shipdate")}")

    // events: the loader must ALWAYS normalize ts to TimestampType,
    // whatever the physical parquet flavor of the current testdata
    // generation (nanos-as-long, micros NTZ, micros UTC).
    fields("events", Tables.events(s, dir)) shouldBe Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)

    fields("documents", Tables.documents(s, dir)) shouldBe Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    fields("embeddings", Tables.embeddings(s, dir)) shouldBe Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  }

  test("events loader yields non-null timestamps spanning expected epoch range") {
    assume(hasTestdata, s"$dir not present")
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
    val row = ev.agg(
      count(lit(1)).as("n"),
      sum(when(col("ts").isNull, 1).otherwise(0)).as("nulls"),
      min(year(col("ts"))).as("ymin"),
      max(year(col("ts"))).as("ymax")).head()
    assert(row.getLong(0) > 0)
    assert(row.getLong(1) == 0L, "null ts after loader normalization")
    // a unit mix-up (nanos read as micros, micros as millis…) lands
    // thousands of years away from any sane event range
    assert(row.getInt(2) >= 1990 && row.getInt(3) <= 2100,
      s"ts out of sane range: ${row.getInt(2)}..${row.getInt(3)} — unit drift?")
  }
}
