package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.{Candle, CandleTimeFrame, StockTransaction}
import graft.operators.Candles
import graft.streaming.CandleStream

class ApiSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("typed Dataset API: Dataset[StockTransaction] => Dataset[Candle]") {
    val txns = Seq(
      StockTransaction("AAPL", 10.0, 5, ts("2024-03-01 09:30:05")),
      StockTransaction("AAPL", 12.0, 3, ts("2024-03-01 09:30:20"))).toDS()
    val candles: Seq[Candle] =
      Candles.rollupTyped(Candles.minuteCandlesTyped(txns), CandleTimeFrame.Hour)
        .collect().toSeq
    assert(candles === Seq(Candle("AAPL", "HOUR",
      ts("2024-03-01 09:00:00"), ts("2024-03-01 10:00:00"),
      10.0, 12.0, 10.0, 12.0, 8L, 2L)))
  }

  test("SQL registration: native functions callable from spark.sql") {
    graft.functions.registerAll(spark)
    val r = spark.sql(
      "SELECT poly_fingerprint64('abc') AS fp, simhash64(array(1L, 3L)) AS sh")
      .collect().head
    assert(r.getAs[Long]("fp") === {
      var h = 0xcbf29ce484222325L
      "abc".getBytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    })
    assert(r.getAs[Long]("sh") === 1L) // bit0: both set; bit1: 1 of 2 → tie -> 0
  }

  test("GraftExtensions injects its functions into a SparkSessionExtensions") {
    // a second SparkContext can't exist in the test JVM, so apply the
    // extension object directly and check the injected builders exist
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; registration below
    // usability-from-SQL of the same builders is covered by the
    // registerAll test above
    val v = spark.sql("SELECT cosine_sim(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c")
      .collect().head.getAs[Double]("c")
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("plan-time validation: MinHash k cap, SQL arity, as-of collisions fail loud") {
    // k beyond the precomputed permutation tables fails at plan time,
    // not as an ArrayIndexOutOfBounds inside executor codegen
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.MinHashSignature(
        org.apache.spark.sql.graft.GraftShim.toExpression(col("x")), 300)
    }
    // SQL callers passing extra args get an arity error, not silence
    graft.functions.registerAll(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0f), array(1.0f), 99)").collect()
    }
    assert(err.getMessage.contains("2 argument"))
    // as-of join rejects left frames whose columns collide with the
    // asof_<col>/__side output names instead of overwriting them
    val left = Seq((1L, ts("2024-01-01 00:00:01"), 0.0))
      .toDF("k", "ts", "asof_v")
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 1.0))
      .toDF("k", "ts", "v")
    intercept[IllegalArgumentException] {
      graft.operators.AsOfJoin.asofBackward(left, right, Seq("k"), "ts")
    }
  }

  test("Kafka-shaped payload parsing matches the reference's JSON contract") {
    val kafka = Seq(
      ("""{"symbol":"AAPL","price":150.5,"quantity":7,"timestamp":"2024-03-01T09:30:05.000Z"}""")
    ).toDF("v").select($"v".cast("binary").as("value"), lit("AAPL").cast("binary").as("key"))
    val txn = CandleStream.fromKafkaShaped(kafka).as[StockTransaction].collect().head
    assert(txn.symbol === "AAPL")
    assert(txn.price === 150.5)
    assert(txn.quantity === 7)
    assert(txn.ts === ts("2024-03-01 09:30:05"))
  }
}
