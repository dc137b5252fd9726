package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.model.{CandleTimeFrame, StockTransaction}
import graft.operators.Candles

/** Property-based invariants of the candle aggregation against a
  * brute-force in-memory reference on random transaction sets.
  */
class CandlePropertySpec extends SparkSpec {

  // raw ScalaCheck (the scalatest bridge isn't on the classpath):
  // deterministic seeded samples, 15 cases per property
  private def forAllSeeded[A](g: Gen[List[A]])(check: List[A] => Unit): Unit =
    (1 to 15).foreach { i =>
      check(g.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(List.empty))
    }
  import spark.implicits._

  private val baseMs = Timestamp.valueOf("2024-06-01 00:00:00").getTime

  private val txnGen: Gen[StockTransaction] = for {
    sym <- Gen.oneOf("A", "B", "C")
    price <- Gen.choose(1, 99999).map(_ / 100.0)
    qty <- Gen.choose(1, 100)
    offsetSec <- Gen.choose(0L, 3 * 3600L)
  } yield StockTransaction(sym, price, qty, new Timestamp(baseMs + offsetSec * 1000))

  // unique (symbol, ts) so open/close are well-defined, like real data
  private val txnsGen: Gen[List[StockTransaction]] =
    Gen.listOfN(60, txnGen).map(
      _.groupBy(t => (t.symbol, t.ts)).values.map(_.head).toList)

  test("minute candles match a brute-force reference on random data") {
    forAllSeeded(txnsGen) { txns =>
      if (txns.nonEmpty) {
        val got = Candles.minuteCandles(txns.toDF()).collect().map { r =>
          (r.getAs[String]("symbol"), r.getAs[Timestamp]("window_start").getTime) ->
            (r.getAs[Double]("open"), r.getAs[Double]("high"), r.getAs[Double]("low"),
              r.getAs[Double]("close"), r.getAs[Long]("volume"), r.getAs[Long]("n_txn"))
        }.toMap
        val want = txns.groupBy(t => (t.symbol, t.ts.getTime / 60000 * 60000)).map {
          case (k, ts) =>
            val sorted = ts.sortBy(_.ts.getTime)
            k -> (sorted.head.price, ts.map(_.price).max, ts.map(_.price).min,
              sorted.last.price, ts.map(_.quantity.toLong).sum, ts.length.toLong)
        }
        assert(got === want)
      }
    }
  }

  test("rollup conserves volume/txn-count and OHLC bounds at every timeframe") {
    forAllSeeded(txnsGen) { txns =>
      if (txns.nonEmpty) {
        val minute = Candles.minuteCandles(txns.toDF())
        for (tf <- Seq(CandleTimeFrame.Hour, CandleTimeFrame.Day, CandleTimeFrame.Month)) {
          val up = Candles.rollup(minute, tf).collect()
          val totalVol = up.map(_.getAs[Long]("volume")).sum
          assert(totalVol === txns.map(_.quantity.toLong).sum)
          assert(up.map(_.getAs[Long]("n_txn")).sum === txns.length.toLong)
          up.foreach { r =>
            val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
              r.getAs[Double]("low"), r.getAs[Double]("close"))
            assert(l <= h && l <= o && o <= h && l <= c && c <= h)
          }
        }
      }
    }
  }
}
