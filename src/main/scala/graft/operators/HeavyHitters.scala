package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters: frequent-item candidates with O(k)
  * state per partial aggregate, independent of vocabulary size.
  *
  * The point at corpus scale: a naive top-k (`groupBy(token).count`)
  * shuffles the ENTIRE distinct vocabulary — at 100 TB of text that is
  * billions of singleton-count rows crossing the wire just to be
  * discarded. Misra–Gries keeps at most k counters per map-side
  * partial; only those k-bounded summaries shuffle (one per
  * partition), and the merge is again k-bounded. The deterministic
  * guarantee (Misra & Gries 1982, "Finding repeated elements";
  * mergeability per Agarwal et al. 2012, "Mergeable summaries"):
  * after arbitrary merge trees, any item with true count
  * `> N/(k+1)` is guaranteed present, and every retained estimate
  * undercounts its true count by at most `N/(k+1)`.
  *
  * The gated query certifies exactly those two claims against exact
  * counts (the `q_approx_distinct` certification pattern): the exact
  * aggregate exists to judge the sketch; production callers at scale
  * run the sketch alone.
  */
object HeavyHitters {

  /** The classic streaming update: increment a held counter, claim a
    * free slot, or decrement ALL counters by one (dropping zeros) —
    * the step that pays for the N/(k+1) bound. The decrement path is
    * O(k) but retires k+1 units of mass, so it amortizes to O(1) per
    * element.
    */
  private def update(m: Map[String, Long], t: String, k: Int): Map[String, Long] =
    m.get(t) match {
      case Some(c)            => m.updated(t, c + 1L)
      case None if m.size < k => m.updated(t, 1L)
      case None               =>
        m.flatMap { case (key, c) => if (c > 1L) Some(key -> (c - 1L)) else None }
    }

  /** Summary merge (Agarwal et al. 2012 §3.2): add counters, then if
    * more than k survive, subtract the (k+1)-th largest count from
    * all and drop the non-positive — error bounds add, so the
    * guarantee survives any merge tree.
    */
  private def mergeMaps(a: Map[String, Long], b: Map[String, Long], k: Int): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val d = sum.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      sum.flatMap { case (t, c) => if (c - d > 0L) Some(t -> (c - d)) else None }
    }
  }

  /** Typed aggregate producing the candidate map; use via
    * `ds.select(misraGries(k).toColumn)` (global) or under a
    * `groupByKey` for per-group heavy hitters. The buffer lives as a
    * JVM object inside ObjectHashAggregate between rows — the encoder
    * only runs at the partial→final boundary.
    */
  def misraGries(k: Int): Aggregator[String, Map[String, Long], Map[String, Long]] =
    new Aggregator[String, Map[String, Long], Map[String, Long]] {
      def zero: Map[String, Long] = Map.empty
      def reduce(b: Map[String, Long], t: String): Map[String, Long] = update(b, t, k)
      def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
        mergeMaps(a, b, k)
      def finish(b: Map[String, Long]): Map[String, Long] = b
      def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
      def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
    }

  /** (token, est) candidate rows from a single string column — the
    * k-bounded sketch side of the certification. At most k rows.
    */
  def candidates(tokens: DataFrame, col0: String, k: Int): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.select(col(col0)).as[String]
      .select(misraGries(k).toColumn.name("mg"))
      .select(explode(col("mg")).as(Seq("token", "est")))
  }

  /** Certification frame: exact counts of the guaranteed-frequent
    * tokens (n·(k+1) > N) with the two deterministic flags —
    * candidate-set membership and the undercount bound — which hold
    * for EVERY partition layout, so the oracle pins them TRUE.
    */
  def certified(tokens: DataFrame, col0: String, k: Int): DataFrame = {
    val cand = candidates(tokens, col0, k)
    val exact = tokens.groupBy(col(col0).as("token"))
      .agg(count(lit(1)).as("n"))
    val total = tokens.agg(count(lit(1)).as("total"))
    exact.crossJoin(broadcast(total))
      .filter(col("n") * (k + 1) > col("total"))
      .join(broadcast(cand), Seq("token"), "left")
      .select(
        col("token"), col("n"),
        col("est").isNotNull.as("in_sketch"),
        (col("est").isNotNull &&
          (col("n") - col("est")) * (k + 1) <= col("total") &&
          col("est") <= col("n")).as("err_in_bound"))
      .orderBy(col("n").desc, col("token"))
  }
}
