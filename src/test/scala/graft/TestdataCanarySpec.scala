package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-drift canary: fails in seconds, loudly, if the driver
  * regenerates `/root/testdata` with a `ts` encoding the loaders
  * mishandle. Round 5 shipped 55 broken queries because the events
  * loader hardcoded the TIMESTAMP(NANOS)-as-long encoding while the
  * regenerated data carried TIMESTAMP(MICROS): the batch path crashed
  * at analysis and the streaming path silently read µs as raw longs,
  * landing every window in 1970. These asserts make either failure
  * mode (crash OR silent epoch shift) a red test immediately.
  */
class TestdataCanarySpec extends SparkSpec {
  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("batch events ts lands in the generated-data year, every sf") {
    for (dir <- sfDirs) {
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType,
        s"$dir: loader must normalize ts to TimestampType")
      val Array(yMin, yMax, n) = df
        .agg(min(year(col("ts"))), max(year(col("ts"))), count(lit(1)))
        .collect()(0).toSeq.map(_.toString.toLong).toArray
      assert(n > 0, s"$dir: events is empty")
      // generator writes 2024 data; a unit mix-up lands in 1970 (µs
      // read as ms) or far future (ns read as µs) — both out of range
      assert(yMin >= 2020 && yMax <= 2030,
        s"$dir: events ts years [$yMin,$yMax] outside sane range — " +
          "ts encoding drifted under the loader")
    }
  }

  test("streaming events read agrees with the batch read bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val batch = Tables.events(spark, dir)
      .agg(min("ts").as("mn"), max("ts").as("mx"), count(lit(1)).as("n"))
      .collect()(0)
    val streamed = streamToBatch(Tables.eventsStream(spark, dir))
    val got = streamed
      .agg(min("ts").as("mn"), max("ts").as("mx"), count(lit(1)).as("n"))
      .collect()(0)
    assert(got == batch,
      s"stream (min,max,count)=$got diverged from batch $batch — " +
        "the stream schema is not derived from the same probe")
  }

  test("all table schemas match the pinned contract (names and types)") {
    // every loader consumes these columns by name and type; a driver
    // regeneration that renames, retypes, or drops one should fail
    // HERE, in one assert, not as 50 scattered analysis errors
    val expected = Map(
      "region" -> "r_regionkey:int,r_name:string",
      "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
      "customer" -> ("c_custkey:bigint,c_name:string,c_nationkey:int," +
        "c_acctbal:double,c_mktsegment:string"),
      "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
      "part" -> ("p_partkey:bigint,p_name:string,p_brand:string,p_type:string," +
        "p_size:int,p_retailprice:double"),
      "orders" -> ("o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string," +
        "o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string"),
      "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint," +
        "l_linenumber:int,l_quantity:double,l_extendedprice:double," +
        "l_discount:double,l_tax:double,l_returnflag:string," +
        "l_linestatus:string,l_shipdate:timestamp_ntz"),
      "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
      "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int",
      // events is post-normalization: the loader's output contract
      "events" -> ("event_id:bigint,ts:timestamp,user_id:bigint," +
        "event_type:string,value:double,props:string"))
    val dir = "/root/testdata/sf0.001"
    for ((table, want) <- expected.toSeq.sortBy(_._1)) {
      val df = if (table == "events") Tables.events(spark, dir)
               else Tables.load(spark, dir, table)
      val got = df.schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
      assert(got == want, s"$table schema drifted:\n  got  $got\n  want $want")
    }
  }

  test("legacy nanos-as-long events encoding still normalizes (fixture)") {
    // current testdata is TIMESTAMP(MICROS); this fixture keeps the
    // LongType branch of the loader covered so a future data flip
    // BACK to nanos stays green too
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nanos-fixture").toString
    val base = 1704067200000000000L // 2024-01-01 00:00:00 UTC in epoch ns
    Seq((1L, base + 1500L, 7L, "view", 1.0, "{}"),
        (2L, base + 86400L * 1000000000L, 8L, "buy", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val years = df.select(year(col("ts"))).as[Int].collect().toSet
    assert(years == Set(2024), s"nanos branch mis-scaled: years=$years")
    // integer ns→µs truncation, not double rounding: base+1500ns → +1µs
    val micros = df.select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(micros.head == base / 1000L + 1L)
  }

  /** Run a file-source stream to completion into an in-memory table. */
  private def streamToBatch(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val name = s"canary_${System.nanoTime()}"
    val q = df.writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
