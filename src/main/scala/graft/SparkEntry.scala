package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.CandleTimeFrame
import graft.operators.{CandleQueries, Candles, Curation, Dedup, LshDedup, MarketAnalytics, Media, Retention, ScalarDrift, Similarity, TextAnalysis}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Output conventions (driver hashes values of name-sorted columns):
  *  - timestamps are emitted as 'yyyy-MM-dd HH:mm:ss' strings: Spark
  *    writes TIMESTAMP_LTZ to parquet (read back tz-aware) while the
  *    DuckDB oracle produces naive timestamps — strings sidestep the
  *    tz-awareness mismatch entirely.
  *  - sums over doubles go through DECIMAL(18,4) accumulation (exact,
  *    order-independent) and are cast back to double — bit-identical
  *    to DuckDB's decimal sum, immune to FP accumulation order.
  *  - every query ends in a deterministic ORDER BY mirrored in the
  *    oracle.
  */
object SparkEntry {

  // ---- shared output-formatting helpers -------------------------------

  /** Timestamp → canonical string (see conventions above). */
  private def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Scratch path for a query's persisted-index artifact: per-process
    * and per-dir, so concurrent runs over the same data never race on
    * one store, and distinct dirs never alias — the raw-dir hash keeps
    * paths distinct even where the readable sanitization is lossy
    * (/a/b vs /a_b). One invocation per (pid, dir) assumed: a
    * concurrent same-pid overwrite of the same store would race an
    * in-flight probe.
    */
  private def scratchStorePath(prefix: String, dir: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/$prefix-" +
      s"${ProcessHandle.current().pid()}-" +
      dir.replaceAll("[^A-Za-z0-9.]", "_") + "-" +
      java.lang.Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    registerScratchCleanup(p)
    p
  }

  /** Scratch stores are caches, not outputs: delete them when the JVM
    * exits (one hook, idempotent registration) so repeated Verify /
    * Bench runs don't accumulate per-process store copies in tmp.
    */
  private val scratchPaths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val scratchCleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      scratchPaths.forEach(p => rm(new java.io.File(p)))
    }))
  private def registerScratchCleanup(path: String): Unit = {
    scratchCleanupHook
    scratchPaths.add(path): Unit
  }

  /** The multi-timeframe candle store, materialized ONCE per
    * (process, sfDir) at a stable scratch path. q_store_recent /
    * q_store_point / q_candle_keys grade the partition-pruned READ
    * path (the Redis-key-scan analogue); rebuilding the store inside
    * every timed invocation made their bench numbers measure the
    * partitioned small-file WRITE instead — the r6 sweep's worst
    * noise source — and leaked a temp dir per call. q_store_roundtrip
    * is the one query whose semantics IS write→read; it keeps a fresh
    * store per invocation.
    */
  private val builtCandleStores = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def candleStoreOnce(s: SparkSession, dir: String): String = {
    val store = scratchStorePath("graft-candles", dir)
    builtCandleStores.synchronized {
      if (!builtCandleStores.contains(store)) {
        graft.operators.CandleStore.write(
          Candles.multiTimeframe(Candles.transactions(s, dir)), store)
        builtCandleStores.add(store): Unit
      }
    }
    store
  }

  /** Order-independent exact sum of a double column via decimal.
    * The exact sum is rounded to 2dp BEFORE the double cast: DuckDB
    * casts wide decimals to double with two roundings (int128→double,
    * then ÷10^scale) which can be 1 ulp off Spark's correctly-rounded
    * cast; a 2dp decimal times 100 is exactly representable, so both
    * engines round identically.
    */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("decimal(38,2)").cast("double")

  /** Same 2dp-stabilized cast for an already-summed decimal column. */
  private def money(c: Column): Column =
    c.cast("decimal(38,2)").cast("double")

  /** Exact Σ l_extendedprice·(1−l_discount) — the TPC-H revenue term
    * as decimal products (order-independent, engine-identical).
    */
  private def revenueSum: Column =
    money(sum(col("l_extendedprice").cast("decimal(18,4)") *
      (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))))

  /** The same revenue term for the DuckDB side (mirrors revenueSum). */
  private val revenueSql: String =
    """CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2)
      |  AS DECIMAL(38,2)) AS DOUBLE)""".stripMargin

  /** Candle frame → driver-comparable output shape. */
  private def candleOut(c: DataFrame): DataFrame =
    c.select(
      col("symbol"), col("timeframe"),
      fmtTs(col("window_start")).as("window_start"),
      fmtTs(col("window_end")).as("window_end"),
      col("open"), col("high"), col("low"), col("close"),
      col("volume"), col("n_txn"))
      .orderBy(col("timeframe"), col("symbol"), col("window_start"))

  /** DuckDB view of the trade stream — must mirror
    * Candles.transactions exactly (incl. the ns→µs truncation Spark's
    * parquet reader forces, Tables.events).
    */
  private val txnCte: String =
    """WITH txn AS (
      |  SELECT event_type AS symbol, value AS price,
      |         CAST(json_extract_string(props, '$.k') AS INTEGER) AS quantity,
      |         make_timestamp(epoch_ns(ts) // 1000) AS ts
      |  FROM events
      |)""".stripMargin

  /** DuckDB minute-candle CTE (appended after txnCte). */
  private val minuteCte: String =
    """, minute_c AS (
      |  SELECT symbol, date_trunc('minute', ts) AS ws,
      |         arg_min(price, ts) AS open, max(price) AS high,
      |         min(price) AS low, arg_max(price, ts) AS close,
      |         CAST(sum(quantity) AS BIGINT) AS volume, count(*) AS n_txn
      |  FROM txn GROUP BY 1, 2
      |)""".stripMargin

  /** DuckDB rollup of minute candles to a coarser calendar unit. */
  private def rollupCte(unit: String): String =
    s""", roll_c AS (
       |  SELECT symbol, date_trunc('$unit', ws) AS ws,
       |         arg_min(open, ws) AS open, max(high) AS high,
       |         min(low) AS low, arg_max(close, ws) AS close,
       |         CAST(sum(volume) AS BIGINT) AS volume,
       |         CAST(sum(n_txn) AS BIGINT) AS n_txn
       |  FROM minute_c GROUP BY 1, 2
       |)""".stripMargin

  private def candleSelect(src: String, tf: String, endExpr: String): String =
    s"""SELECT symbol, '$tf' AS timeframe,
       |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       |  strftime($endExpr, '%Y-%m-%d %H:%M:%S') AS window_end,
       |  open, high, low, close, volume, n_txn
       |FROM $src ORDER BY timeframe, symbol, window_start""".stripMargin

  private def rollupSql(tf: String): String = {
    val unit = CandleTimeFrame.truncUnit(tf)
    txnCte + minuteCte + rollupCte(unit) + "\n" +
      candleSelect("roll_c", tf, s"ws + INTERVAL 1 $unit")
  }

  /** DuckDB-reproducible MinHash/SimHash oracles.
    *
    * The engine's whole candidate chain — FNV-1a token hash →
    * rolling shingle fold → splitmix64 finalizer → LCG permutations →
    * band fold (GraftExpressions.scala) — is plain 64-bit wraparound
    * arithmetic, so it re-expresses exactly in DuckDB as HUGEINT
    * arithmetic mod 2^64 (the q_fingerprint technique, extended):
    *  - multipliers ≥ 2^32 are hi/lo split so no intermediate product
    *    exceeds HUGEINT range: a·h ≡ a_hi·((h mod 2^32)·2^32) + a_lo·h,
    *    every term < 2^97;
    *  - logical right-shifts are `//` by powers of two (values are
    *    kept unsigned in [0, 2^64));
    *  - the signature's SIGNED-long minimum is taken under a +2^63
    *    bias (signed order ≡ unsigned order of x+2^63 mod 2^64);
    *  - permutation constants come from the same public splitmix64
    *    derivation the engine uses (MinHashSignature.mix), embedded as
    *    literal tables — algorithm parameters, like FNV's prime.
    * splitmix64's xor-with-shift needs its argument twice, so it runs
    * as four chained list_transform stages, each introducing the fresh
    * lambda binding the next step needs.
    */
  private object SketchOracles {
    import org.apache.spark.sql.graft.MinHashSignature.mix
    private val M = "18446744073709551616::HUGEINT"
    private val Golden = "11400714819323198485::HUGEINT" // 0x9e3779b97f4a7c15
    private val FnvP = "1099511628211"                   // 0x100000001b3 < 2^41
    private val Bias = "9223372036854775808::HUGEINT"    // 2^63
    private def u64(x: Long): BigInt = BigInt(x) & BigInt("ffffffffffffffff", 16)

    private def mixStages(inner: String): String = {
      val c1 = u64(0xbf58476d1ce4e5b9L); val c2 = u64(0x94d049bb133111ebL)
      s"""list_transform(list_transform(list_transform(list_transform($inner,
         |  z -> (z + $Golden) % $M),
         |  z -> (${c1 >> 32}::HUGEINT * ((xor(z, z // 1073741824) % 4294967296) * 4294967296) % $M + ${c1 & 0xffffffffL}::HUGEINT * xor(z, z // 1073741824)) % $M),
         |  z -> (${c2 >> 32}::HUGEINT * ((xor(z, z // 134217728) % 4294967296) * 4294967296) % $M + ${c2 & 0xffffffffL}::HUGEINT * xor(z, z // 134217728)) % $M),
         |  z -> xor(z, z // 2147483648))""".stripMargin
    }

    /** doc_id + FNV-1a token hashes (mirrors TextAnalysis.tokens +
      * poly_fingerprint64 per token, over UTF-8 bytes via hex pairs).
      * `tokenHashBody` is the WITH-list fragment (no leading WITH)
      * parameterized on the source relation, so the composed-pipeline
      * oracle can run the identical chain over a survivor CTE.
      */
    private def tokenHashBody(src: String): String =
      s"""toks AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
         |    t -> len(t) > 0) AS tk
         |  FROM $src
         |), th AS (
         |  SELECT doc_id, list_transform(tk, t -> list_reduce(
         |    list_prepend(14695981039346656037::HUGEINT,
         |      list_transform(generate_series(1, octet_length(encode(t))),
         |        i -> CAST(CAST('0x' || substr(hex(encode(t)), 2*i-1, 2) AS INTEGER) AS HUGEINT))),
         |    (acc, b) -> (xor(acc, b) * $FnvP) % $M)) AS tkh
         |  FROM toks
         |)""".stripMargin

    private val tokenHashCte: String = "WITH " + tokenHashBody("documents")

    /** Rolling 3-gram fold over the token hashes (ShingleHashes). */
    private val shingleFold: String =
      s"""list_transform(generate_series(1, len(tkh) - 2), i ->
         |  (xor((xor((xor($Golden, tkh[i]) * $FnvP) % $M,
         |    tkh[i+1]) * $FnvP) % $M, tkh[i+2]) * $FnvP) % $M)""".stripMargin

    /** The same rolling fold generalized to n-gram width (ShingleHashes
      * with arbitrary n) — built by nesting the xor-mul step, exactly
      * the loop the native expression runs.
      */
    private def shingleFoldN(n: Int): String = {
      val fold = (1 until n).foldLeft(s"(xor($Golden, tkh[i]) * $FnvP) % $M") {
        (acc, j) => s"(xor($acc, tkh[i+$j]) * $FnvP) % $M"
      }
      s"list_transform(generate_series(1, len(tkh) - ${n - 1}), i -> $fold)"
    }

    /** Duplicated-substring report (Dedup.duplicateSpans, n=8): dup
      * gram hashes = positional 8-gram hashes occurring >1 time
      * corpus-wide; per doc, the dup occurrence count and the distinct
      * token positions covered. Positions are 1-based here vs Spark's
      * 0-based posexplode — pure offsets, the covered-position COUNTS
      * are offset-invariant.
      */
    val substringSql: String =
      s"""$tokenHashCte, shl AS (
         |  SELECT doc_id, ${mixStages(shingleFoldN(8))} AS sh
         |  FROM th WHERE len(tkh) >= 8
         |), posed AS (
         |  SELECT doc_id, u.p AS pos, u.h AS h
         |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(sh)),
         |          i -> {'p': i, 'h': sh[i]})) AS u
         |        FROM shl)
         |), dup AS (
         |  SELECT h FROM posed GROUP BY h HAVING count(*) > 1
         |), docc AS (
         |  SELECT p.doc_id, p.pos FROM posed p JOIN dup USING (h)
         |), covered AS (
         |  SELECT DISTINCT doc_id, pos + d AS tpos
         |  FROM docc, generate_series(0, 7) AS g(d)
         |)
         |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
         |  CAST(coalesce(o.n, 0) AS BIGINT) AS n_dup_grams,
         |  CAST(coalesce(c.n, 0) AS BIGINT) AS n_dup_tokens
         |FROM (SELECT doc_id, len(tkh) AS n_tokens FROM th) b
         |LEFT JOIN (SELECT doc_id, count(*) AS n FROM docc GROUP BY 1) o
         |  USING (doc_id)
         |LEFT JOIN (SELECT doc_id, count(*) AS n FROM covered GROUP BY 1) c
         |  USING (doc_id)
         |ORDER BY doc_id""".stripMargin

    /** ExactSubstr cut (Dedup.cutDuplicateSpans): corpus-wide
      * first-occurrence rank per dup hash (row_number over (doc_id,
      * pos) — a unique total order, so the kept set is deterministic),
      * later occurrences' spans cut, text rebuilt from surviving
      * tokens. 1-based positions throughout, matching posed.
      */
    val substringCutSql: String =
      s"""$tokenHashCte, shl AS (
         |  SELECT doc_id, ${mixStages(shingleFoldN(8))} AS sh
         |  FROM th WHERE len(tkh) >= 8
         |), posed AS (
         |  SELECT doc_id, u.p AS pos, u.h AS h
         |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(sh)),
         |          i -> {'p': i, 'h': sh[i]})) AS u
         |        FROM shl)
         |), dup AS (
         |  SELECT h FROM posed GROUP BY h HAVING count(*) > 1
         |), ranked AS (
         |  SELECT p.doc_id, p.pos,
         |    row_number() OVER (PARTITION BY p.h ORDER BY p.doc_id, p.pos) AS rk
         |  FROM posed p JOIN dup USING (h)
         |), cutp AS (
         |  SELECT DISTINCT doc_id, pos + d AS tpos
         |  FROM ranked, generate_series(0, 7) AS g(d) WHERE rk > 1
         |), tokpos AS (
         |  SELECT doc_id, u.p AS tpos, u.t AS tok
         |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(tk)),
         |          i -> {'p': i, 't': tk[i]})) AS u
         |        FROM toks)
         |), keptagg AS (
         |  SELECT t.doc_id, count(*) AS n_kept,
         |    string_agg(t.tok, ' ' ORDER BY t.tpos) AS text_kept
         |  FROM tokpos t
         |  LEFT JOIN cutp c ON t.doc_id = c.doc_id AND t.tpos = c.tpos
         |  WHERE c.doc_id IS NULL
         |  GROUP BY t.doc_id
         |)
         |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
         |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_tokens_kept,
         |  coalesce(k.text_kept, '') AS text_kept
         |FROM (SELECT doc_id, len(tk) AS n_tokens FROM toks) b
         |LEFT JOIN keptagg k USING (doc_id)
         |ORDER BY doc_id""".stripMargin

    /** (i, a_hi, a_lo, b) permutation table, i = 1..64. */
    private val permRows: String = (0 until 64).map { i =>
      val a = u64(mix(2 * i + 1) | 1L); val b = u64(mix(2 * i + 2))
      s"(${i + 1},${a >> 32},${a & 0xffffffffL},$b)"
    }.mkString(",")

    /** The shared signature chain: token FNV → shingles → 64-perm
      * signatures → band hashes → skew-capped buckets. Ends inside
      * the WITH list so callers append their own final CTEs/select.
      */
    private val minhashCtes: String = {
      val bandFold =
        s"""list_transform(generate_series(0, 15), b ->
           |  (xor((xor((xor((xor(xor($Golden, CAST(b AS HUGEINT)), sg[4*b+1]) * $FnvP) % $M,
           |    sg[4*b+2]) * $FnvP) % $M,
           |    sg[4*b+3]) * $FnvP) % $M,
           |    sg[4*b+4]) * $FnvP) % $M)""".stripMargin
      s"""$tokenHashCte, shs AS (
         |  SELECT doc_id, list_distinct(${mixStages(shingleFold)}) AS sh
         |  FROM th WHERE len(tkh) >= 3
         |), ex AS (
         |  SELECT doc_id, unnest(sh) AS h FROM shs
         |), perm(i, ahi, alo, bc) AS (VALUES $permRows
         |), sigr AS (
         |  SELECT doc_id, i, (min(((CAST(ahi AS HUGEINT) * ((h % 4294967296) * 4294967296) % $M
         |    + CAST(alo AS HUGEINT) * h + CAST(bc AS HUGEINT)) % $M
         |    + $Bias) % $M) + $Bias) % $M AS sv
         |  FROM ex CROSS JOIN perm
         |  GROUP BY doc_id, i
         |), sig AS (
         |  SELECT doc_id, list(sv ORDER BY i) AS sg FROM sigr GROUP BY doc_id
         |), bh AS (
         |  SELECT doc_id, ${mixStages(bandFold)} AS bhs FROM sig
         |), bx AS (
         |  SELECT doc_id, u.b AS band, u.h AS h
         |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, 16),
         |          i -> {'b': i, 'h': bhs[i]})) AS u FROM bh)
         |), ok AS (
         |  SELECT band, h FROM bx GROUP BY band, h HAVING count(*) BETWEEN 2 AND 1000
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bx a JOIN bx b ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
         |  JOIN ok ON a.band = ok.band AND a.h = ok.h
         |)""".stripMargin
    }

    val minhashSql: String =
      s"""$minhashCtes
         |SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b""".stripMargin

    /** Shared CTE chain for the df-capped prefix-probe containment
      * miner (LshDedup.containmentPairsCapped): the capped candidate
      * semantics — ∃ shared shingle in the probe's rarest-first
      * prefix with df ≤ cap — depends on the global (df, signed
      * hash) order, so the oracle reproduces the FNV shingle hashes
      * and breaks df ties by the SIGNED 64-bit value, exactly the
      * order the engine's sort_array over (df, s) structs uses.
      * Ends inside the WITH list at `pair_int` (full exact
      * intersection over the capped candidate set). The effective
      * cap is min(maxDf, ⌈pct%·N⌉, budget_cap) — the corpus-relative
      * fold via the integer-exact ceil division (N·pct + 99) // 100,
      * clamped by the work budget (largest df class c with
      * Σ_{df≤c} cnt·df² ≤ budget) — the same pure-integer folds the
      * engine computes in long arithmetic.
      */
    private def containmentCappedCtes(t: Double, n: Int, maxDf: Int, pct: Int,
                                      budget: Long): String =
      "WITH " + containmentCappedBody(t, n, maxDf, pct, budget, "documents")

    /** The same chain as a WITH-list fragment over any source
      * relation (the composed-pipeline oracle runs it over the
      * post-decontamination survivor CTE).
      */
    private def containmentCappedBody(t: Double, n: Int, maxDf: Int, pct: Int,
                                      budget: Long, src: String): String =
      s"""${tokenHashBody(src)}, shs AS (
         |  SELECT doc_id, list_distinct(${mixStages(shingleFoldN(n))}) AS sh
         |  FROM th WHERE len(tkh) >= $n
         |), ex AS (SELECT doc_id, unnest(sh) AS h FROM shs),
         |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shs),
         |dfq AS (SELECT h, count(*) AS df FROM ex GROUP BY h),
         |dfh AS (SELECT df, count(*) AS cnt FROM dfq GROUP BY df),
         |bcap AS (
         |  SELECT coalesce(max(df), 0) AS budget_cap FROM (
         |    SELECT df, sum(cnt * df * df) OVER (ORDER BY df) AS cum FROM dfh)
         |  WHERE cum <= $budget
         |), dcap AS (
         |  SELECT least(least($maxDf, (SELECT (count(*) * $pct + 99) // 100
         |    FROM shs)), (SELECT budget_cap FROM bcap)) AS df_cap
         |),
         |ord AS (
         |  SELECT e.doc_id, e.h, d.df,
         |    row_number() OVER (PARTITION BY e.doc_id ORDER BY d.df,
         |      CASE WHEN e.h >= $Bias THEN e.h - $M ELSE e.h END) AS rk
         |  FROM ex e JOIN dfq d USING (h)
         |), ordc AS (
         |  SELECT o.doc_id, o.h, o.rk, sz.n_sh FROM ord o
         |  JOIN sizes sz USING (doc_id)
         |  WHERE o.df <= (SELECT df_cap FROM dcap)
         |), pref AS (
         |  SELECT doc_id, h, rk, n_sh FROM ordc
         |  WHERE rk <= n_sh - ceil($t * n_sh - 1e-9) + 1
         |), cand AS (
         |  -- positional filter: len − pos − 1 = n_sh − rk (rk 1-based)
         |  SELECT DISTINCT p.doc_id AS doc_a, e.doc_id AS doc_b
         |  FROM pref p JOIN ordc e ON e.h = p.h AND e.doc_id <> p.doc_id
         |  WHERE 1 + least(p.n_sh - p.rk, e.n_sh - e.rk)
         |    >= $t * p.n_sh - 1e-9
         |), pair_int AS (
         |  SELECT c.doc_a, c.doc_b, count(*) AS n_int
         |  FROM cand c JOIN ex ea ON ea.doc_id = c.doc_a
         |  JOIN ex eb ON eb.doc_id = c.doc_b AND eb.h = ea.h
         |  GROUP BY 1, 2
         |)""".stripMargin

    val containmentCappedSql: String =
      s"""${containmentCappedCtes(0.5, 5, 1000, 1, 500000000L)}
         |SELECT doc_a, doc_b,
         |  CAST(floor(CAST(n_int AS DOUBLE) / sa.n_sh * 1000000) AS BIGINT)
         |    AS containment_micro
         |FROM pair_int JOIN sizes sa ON sa.doc_id = doc_a
         |WHERE CAST(n_int AS DOUBLE) / sa.n_sh >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin

    /** Recall gate: capped pair count vs the exact all-ordered-pairs
      * count (capped ⊆ exact, so the ratio is pair recall), plus the
      * number of grams the cap removed — recall 1.0 with zero capped
      * grams would be a vacuous gate.
      */
    val containmentRecallSql: String =
      s"""${containmentCappedCtes(0.5, 5, 1000, 1, 500000000L)}, capped AS (
         |  SELECT count(*) AS n_pairs_capped FROM pair_int
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  WHERE CAST(n_int AS DOUBLE) / sa.n_sh >= 0.5
         |), allpair AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_int
         |  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2
         |), exact_cnt AS (
         |  SELECT count(*) AS n_pairs_exact FROM allpair
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  WHERE CAST(n_int AS DOUBLE) / sa.n_sh >= 0.5
         |), grams AS (SELECT count(*) AS n_grams_capped FROM dfq
         |  WHERE df > (SELECT df_cap FROM dcap)),
         |nd AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_pairs_exact AS BIGINT) AS n_pairs_exact,
         |  CAST(n_pairs_capped AS BIGINT) AS n_pairs_capped,
         |  CAST(n_grams_capped AS BIGINT) AS n_grams_capped,
         |  CASE WHEN n_pairs_exact = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE CAST(floor(CAST(n_pairs_capped AS DOUBLE)
         |         / n_pairs_exact * 1000000) AS BIGINT)
         |  END AS recall_micro
         |FROM nd, exact_cnt, capped, grams""".stripMargin

    /** DSIR importance weights (Curation.dsirWeights): FNV token
      * hashes mod 256 bucket the corpus; per-bucket Laplace-smoothed
      * target/raw log-ratios snap to integer micro units BEFORE the
      * per-doc sum, so the document weight is an exact integer sum —
      * summation order (which neither engine pins) cannot move it.
      * `z % 256` on the HUGEINT u64 equals the engine's signed pmod
      * because 256 divides 2^64.
      */
    val dsirSql: String =
      s"""$tokenHashCte, tb AS (
         |  SELECT th.doc_id, d.source = 'src0' AS is_t,
         |    unnest(list_transform(tkh, z -> z % 256)) AS b
         |  FROM th JOIN documents d ON th.doc_id = d.doc_id
         |), st AS (
         |  SELECT b, sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS n_t,
         |    sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS n_r
         |  FROM tb GROUP BY 1
         |), tot AS (SELECT sum(n_t) AS tot_t, sum(n_r) AS tot_r FROM st),
         |r AS (
         |  SELECT b, CAST(floor(ln(
         |      CAST((n_t + 1) * (tot_r + 256) AS DOUBLE) /
         |      ((n_r + 1) * (tot_t + 256))) * 1000000) AS BIGINT) AS r_micro
         |  FROM st CROSS JOIN tot
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(r_micro) AS BIGINT) AS weight_micro
         |FROM tb JOIN r USING (b) WHERE NOT is_t
         |GROUP BY doc_id
         |ORDER BY weight_micro DESC, doc_id LIMIT 100""".stripMargin

    /** Exact-Jaccard pairs → reachability closure → min-label
      * clusters, over the full corpus. Shared by q_dedup_cluster and
      * q_dedup_cluster_incr: the incremental assignment-merge must
      * reproduce the full recompute exactly.
      */
    val clusterCcSql: String =
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |    t -> len(t) > 0) AS tk
        |  FROM documents
        |), shset AS (
        |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |    i -> array_to_string(list_slice(tk, i, i + 2), ' '))) AS sh
        |  FROM toks WHERE len(tk) >= 3
        |), ex AS (SELECT doc_id, unnest(sh) AS s FROM shset),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shset),
        |pair_int AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_int
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM pair_int
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE CAST(n_int AS DOUBLE) / (sa.n_sh + sb.n_sh - n_int) >= 0.8
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs
        |), reach AS (
        |  SELECT DISTINCT src AS doc_id, src AS lbl FROM edges
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.doc_id
        |)
        |SELECT doc_id, min(lbl) AS cluster_id
        |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin

    /** Incremental maintenance gate: the same full candidate chain,
      * restricted to pairs touching the eval cohort (md5 >= 'cccd' =
      * Corpus.splitLabel eval at 0.8) — what BandStore's batch probe
      * must reproduce without re-banding the corpus.
      */
    val minhashIncrSql: String =
      s"""$minhashCtes
         |SELECT doc_a, doc_b FROM cand
         |WHERE md5(CAST(doc_a AS VARCHAR)) >= 'cccd'
         |   OR md5(CAST(doc_b AS VARCHAR)) >= 'cccd'
         |ORDER BY doc_a, doc_b""".stripMargin

    /** Per-source skew-cap drop report over the same bucket frame
      * (bx) as the candidate chain; threshold mirrors the wiring's
      * maxBucket = 2. (The chain's ok/cand CTEs go unused here.)
      */
    val dedupHealthSql: String =
      s"""$minhashCtes, sizes AS (
         |  SELECT band, h, count(*) AS n_docs FROM bx GROUP BY 1, 2
         |), droppedb AS (
         |  SELECT band, h FROM sizes WHERE n_docs > 2
         |), slot AS (
         |  SELECT bx.doc_id, count(*) AS n_slots
         |  FROM bx JOIN droppedb ON bx.band = droppedb.band AND bx.h = droppedb.h
         |  GROUP BY 1
         |), idx AS (SELECT DISTINCT doc_id FROM bx)
         |SELECT d.source,
         |  count(*) AS n_docs_indexed,
         |  CAST(coalesce(sum(s.n_slots), 0) AS BIGINT) AS n_slots_dropped,
         |  CAST(sum(CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_docs_affected
         |FROM idx
         |JOIN documents d USING (doc_id)
         |LEFT JOIN slot s ON idx.doc_id = s.doc_id
         |GROUP BY 1 ORDER BY source""".stripMargin

    /** Winnowing (value-set variant): positional shingle hashes →
      * sliding-window min (signed-long order, matching Spark) →
      * distinct selected values. Positions are 1-based here vs
      * Spark's 0-based posexplode, hence pos >= w (not w-1).
      */
    val winnowSql: String =
      s"""$tokenHashCte, shl AS (
         |  SELECT doc_id, ${mixStages(shingleFold)} AS sh
         |  FROM th WHERE len(tkh) >= 3
         |), posed AS (
         |  SELECT doc_id, u.p AS pos,
         |    CAST(CASE WHEN u.h < $Bias THEN u.h ELSE u.h - $M END AS BIGINT) AS h
         |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(sh)),
         |          i -> {'p': i, 'h': sh[i]})) AS u
         |        FROM shl WHERE len(sh) >= 4)
         |), wmin AS (
         |  SELECT doc_id, pos, min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
         |  FROM posed
         |)
         |SELECT DISTINCT doc_id, fp FROM wmin WHERE pos >= 4
         |ORDER BY doc_id, fp""".stripMargin

    /** Calibration: signature-agreement estimate (pure integer micro
      * units) next to exact shingle Jaccard, per candidate pair.
      */
    val minhashEstSql: String =
      s"""$minhashCtes
         |SELECT c.doc_a, c.doc_b,
         |  CAST(len(list_filter(generate_series(1, 64), i -> sa.sg[i] = sb.sg[i]))
         |    * 15625 AS BIGINT) AS est_micro,
         |  CAST(floor(len(list_intersect(ha.sh, hb.sh)) * 1000000.0
         |    / len(list_distinct(list_concat(ha.sh, hb.sh)))) AS BIGINT) AS jac_micro
         |FROM cand c
         |JOIN sig sa ON sa.doc_id = c.doc_a
         |JOIN sig sb ON sb.doc_id = c.doc_b
         |JOIN shs ha ON ha.doc_id = c.doc_a
         |JOIN shs hb ON hb.doc_id = c.doc_b
         |ORDER BY doc_a, doc_b""".stripMargin

    /** Hyperplane-LSH ANN oracle (nBits=4, single-probe, top-10): the
      * ±1 hyperplane components are parities of the engine's
      * splitmix64 derivation (HyperplaneSig), precomputed here and
      * embedded as literal sign vectors; the dot products accumulate
      * left-to-right in double exactly as the native expression does
      * (prepended 0.0 start, s·v addition), so bucket assignment is
      * bit-identical. Candidates = exact bucket match; ranking reuses
      * the q_knn_brute cosine pattern. Sign tables cover the
      * testdata's 64-dim embeddings.
      */
    val annLshSql: String = {
      val nBits = 4; val dim = 64
      val signLists = (0 until nBits).map { j =>
        val s = (0 until dim).map(i =>
          if ((mix(j.toLong * 1000003L + i) & 1L) == 0L) "1.0" else "-1.0")
        s"CAST([${s.mkString(",")}] AS DOUBLE[]) AS s$j"
      }.mkString(", ")
      val bitTerms = (0 until nBits).map { j =>
        s"""(CASE WHEN list_reduce(list_prepend(0.0,
           |    list_transform(generate_series(1, len(e)), i -> s$j[i] * e[i])),
           |    (a, b) -> a + b) >= 0 THEN ${1 << j} ELSE 0 END)""".stripMargin
      }.mkString(" + ")
      s"""WITH sgn AS (SELECT $signLists
         |), c0 AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
         |), sig AS (
         |  SELECT vec_id, e, $bitTerms AS bucket FROM c0 CROSS JOIN sgn
         |), q AS (
         |  SELECT vec_id AS query_id, e AS qe, bucket FROM sig WHERE vec_id < 3
         |), s AS (
         |  SELECT q.query_id, v.vec_id,
         |    list_cosine_similarity(v.e, q.qe) AS sim
         |  FROM sig v JOIN q ON v.bucket = q.bucket
         |), r AS (
         |  SELECT query_id, vec_id, sim,
         |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
         |  FROM s
         |)
         |SELECT query_id, rank, vec_id, CAST(floor(sim * 1000000) AS BIGINT) AS sim_micro
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    }

    /** IVF ANN oracle (16 md5-picked centroid cells, nProbe=4,
      * top-10): centroid pick, argmax cell assignment, probe ranking
      * and candidate ranking all mirror the operator 1:1. Cosine ties
      * at double precision would be the only divergence source — the
      * same tolerance the long-green q_knn_brute oracle runs under.
      */
    val annIvfSql: String =
      """WITH c0 AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
        |), cent AS (
        |  SELECT vec_id AS cell_id, e AS c FROM c0
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
        |), asg AS (
        |  SELECT vec_id, e, cell_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY list_cosine_similarity(e, c) DESC, cell_id) AS rn
        |  FROM c0 CROSS JOIN cent
        |), idx AS (
        |  SELECT vec_id, e, cell_id FROM asg WHERE rn = 1
        |), q AS (
        |  SELECT vec_id AS query_id, e AS qe FROM c0 WHERE vec_id < 3
        |), probes AS (
        |  SELECT query_id, qe, cell_id FROM (
        |    SELECT q.query_id, q.qe, cent.cell_id,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY list_cosine_similarity(q.qe, cent.c) DESC, cent.cell_id) AS rn
        |    FROM q CROSS JOIN cent)
        |  WHERE rn <= 4
        |), s AS (
        |  SELECT p.query_id, v.vec_id, list_cosine_similarity(v.e, p.qe) AS sim
        |  FROM idx v JOIN probes p ON v.cell_id = p.cell_id
        |), r AS (
        |  SELECT query_id, vec_id, sim, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, vec_id) AS rank
        |  FROM s
        |)
        |SELECT query_id, rank, vec_id, CAST(floor(sim * 1000000) AS BIGINT) AS sim_micro
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

    /** All pairs with hamming ≤ 6: the pigeonhole chunk bucketing the
      * engine uses (7 chunks of 64/7 bits) guarantees every such pair
      * shares a chunk, so the engine's candidate∩filter output EQUALS
      * the all-pairs answer — the oracle needs no bucket replica.
      */
    val simhashSql: String = {
      val pw = (0 until 64).map(b => BigInt(1) << b).mkString("[", ",", "]")
      s"""$tokenHashCte, pws AS (SELECT CAST($pw AS HUGEINT[]) AS pw
         |), sims AS (
         |  SELECT doc_id,
         |    list_sum(list_transform(generate_series(0, 63), b ->
         |      CASE WHEN 2 * len(list_filter(tkh, h -> (h // pw[b+1]) % 2 = 1)) > len(tkh)
         |           THEN pw[b+1] ELSE 0::HUGEINT END)) AS su
         |  FROM th CROSS JOIN pws
         |), ss AS (
         |  SELECT doc_id, CAST(CASE WHEN su >= $Bias
         |    THEN su - $M ELSE su END AS BIGINT) AS s
         |  FROM sims
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
         |FROM ss a JOIN ss b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.s, b.s)) <= 6
         |ORDER BY doc_a, doc_b""".stripMargin
    }

    /** Composed exact-dedup → simhash recall report: survivors are
      * the min-doc_id content-hash keepers, the pair counts are the
      * same all-pairs hamming≤6 ground truth as [[simhashSql]]
      * restricted to survivors. The capped count is certified equal
      * to the exact count — valid at gate SF because no survivor
      * bucket exceeds the default cap (the identical certification
      * strategy as q_dedup_simhash_capped); the sf1 run where the
      * cap may bind is the measured-recall evidence in NOTES, not a
      * DuckDB compare (all-pairs simhash is the documented
      * oracle-cost exclusion class there).
      */
    val simhashComposedSql: String = {
      val pw = (0 until 64).map(b => BigInt(1) << b).mkString("[", ",", "]")
      s"""$tokenHashCte, keep AS (
         |  SELECT min(doc_id) AS doc_id FROM documents
         |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         |), pws AS (SELECT CAST($pw AS HUGEINT[]) AS pw
         |), sims AS (
         |  SELECT th.doc_id,
         |    list_sum(list_transform(generate_series(0, 63), b ->
         |      CASE WHEN 2 * len(list_filter(tkh, h -> (h // pw[b+1]) % 2 = 1)) > len(tkh)
         |           THEN pw[b+1] ELSE 0::HUGEINT END)) AS su
         |  FROM th JOIN keep USING (doc_id) CROSS JOIN pws
         |), ss AS (
         |  SELECT doc_id, CAST(CASE WHEN su >= $Bias
         |    THEN su - $M ELSE su END AS BIGINT) AS s
         |  FROM sims
         |), pairs AS (
         |  SELECT count(*) AS n FROM ss a JOIN ss b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.s, b.s)) <= 6
         |)
         |SELECT (SELECT count(*) FROM documents) AS n_docs,
         |  (SELECT count(*) FROM keep) AS n_survivors,
         |  n AS n_pairs_exact, n AS n_pairs_capped,
         |  CASE WHEN n = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE CAST(floor(CAST(n AS DOUBLE) / CAST(n AS DOUBLE)
         |         * 1000000) AS BIGINT) END AS recall_micro
         |FROM pairs""".stripMargin
    }

    /** The curate funnel's WITH-list (quality rules, md5 content-hash
      * min-id keeper, md5-threshold split, distinct 5-gram eval
      * decontamination) — the q_pipeline_curate chain, factored so
      * the composed-pipeline oracle reuses it VERBATIM as its head.
      */
    val curateBody: String =
      """t AS (
        |  SELECT doc_id, source, text,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, source, text, toks,
        |    round(0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
        |      + 0.2 * (CASE WHEN (CASE WHEN len(toks) > 0 THEN
        |          CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(toks)
        |          ELSE 0.0 END) BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.0 END)
        |      + 0.2 * (CASE WHEN (CASE WHEN length(text) > 0 THEN
        |          CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) / length(text)
        |          ELSE 0.0 END) BETWEEN 0.0 AND 0.2 THEN 1.0 ELSE 0.0 END)
        |      + 0.2 * least((CASE WHEN len(toks) > 0 THEN
        |          CAST(len(list_filter(toks, x -> list_contains(
        |            ['the','a','an','and','of','to','in','is','it','that'], x))) AS DOUBLE)
        |            / len(toks) ELSE 0.0 END) * 5.0, 1.0), 6) AS quality,
        |    len(list_filter(toks, x -> list_contains(['the','and','of','is','that'], x))) AS en,
        |    len(list_filter(toks, x -> list_contains(['el','los','las','es','y'], x))) AS es,
        |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], x))) AS de,
        |    len(list_filter(toks, x -> list_contains(['le','les','est','et','dans'], x))) AS fr,
        |    length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS zh
        |  FROM t
        |), f AS (
        |  SELECT doc_id, source, toks,
        |    (len(toks) >= 40 AND greatest(en, es, de, fr, zh) > 0
        |      AND quality >= 0.5) AS kept,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS hash,
        |    CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cccd' THEN 'train'
        |         ELSE 'eval' END AS cohort
        |  FROM m
        |), u AS (
        |  SELECT *, kept AND doc_id =
        |    min(CASE WHEN kept THEN doc_id END) OVER (PARTITION BY hash) AS uniq
        |  FROM f
        |), grams AS (
        |  SELECT doc_id, cohort,
        |    unnest(list_distinct(list_transform(generate_series(1, len(toks) - 4),
        |      i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS gram
        |  FROM u WHERE uniq AND len(toks) >= 5
        |), ev AS (SELECT DISTINCT gram FROM grams WHERE cohort = 'eval'
        |), dirty AS (
        |  SELECT DISTINCT doc_id FROM grams JOIN ev USING (gram)
        |  WHERE cohort = 'train'
        |), c AS (
        |  SELECT u.*, (uniq AND cohort = 'train'
        |    AND dirty.doc_id IS NULL) AS clean
        |  FROM u LEFT JOIN dirty ON u.doc_id = dirty.doc_id
        |)""".stripMargin

    /** The composed end-to-end pipeline oracle (q_pipeline_full):
      * curate funnel → capped containment prune (the containing doc
      * survives; mutual containment keeps min(doc_id)) → DSIR
      * threshold resample (targets + raw docs with positive weight) →
      * UniMax mix → token-balanced shards → sequence packing, each
      * stage replaying its already-gated oracle chain verbatim over
      * the previous stage's survivor CTE, emitting the stage funnel
      * (stage_id, stage, n_docs, n_tokens).
      */
    val pipelineFullSql: String = {
      // DuckDB 1.0 INLINES every CTE reference (no auto-
      // materialization), and the composed funnel references each
      // survivor tier several times — sv7 alone four times, each
      // re-expanding the whole containment chain below it, which
      // turns the oracle exponential. Forcing AS MATERIALIZED on the
      // shared tiers is the oracle-side twin of the engine's
      // localCheckpoint tier cut. (\b anchors keep `c` from matching
      // inside `ordc`.)
      val raw = pipelineFullRaw
      Seq("toks", "th", "t", "m", "f", "u", "grams", "ev", "dirty", "c",
        "sv5", "shs", "ex", "sizes", "dfq", "dfh", "ord", "ordc", "pref",
        "cand", "pair_int", "cpair", "cdrop", "sv6", "dtb", "dst", "dr",
        "dw", "sv7")
        .foldLeft(raw)((s, n) =>
          s.replaceAll(s"\\b$n AS \\(", s"$n AS MATERIALIZED ("))
    }

    private def pipelineFullRaw: String =
      s"""WITH $curateBody, sv5 AS (
         |  SELECT c.doc_id, c.source, d.text,
         |    CAST(len(c.toks) AS BIGINT) AS n_tok
         |  FROM c JOIN documents d USING (doc_id) WHERE c.clean
         |), ${containmentCappedBody(0.5, 5, 1000, 1, 500000000L, "sv5")}, cpair AS (
         |  SELECT doc_a, doc_b FROM pair_int
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  WHERE CAST(n_int AS DOUBLE) / sa.n_sh >= 0.5
         |), cdrop AS (
         |  SELECT DISTINCT p.doc_a AS doc_id
         |  FROM cpair p LEFT JOIN cpair q
         |    ON q.doc_a = p.doc_b AND q.doc_b = p.doc_a
         |  WHERE q.doc_a IS NULL OR p.doc_a > p.doc_b
         |), sv6 AS (
         |  SELECT * FROM sv5 WHERE doc_id NOT IN (SELECT doc_id FROM cdrop)
         |), dtb AS (
         |  SELECT th.doc_id, s.source = 'src0' AS is_t,
         |    unnest(list_transform(th.tkh, z -> z % 256)) AS b
         |  FROM th JOIN sv6 s USING (doc_id)
         |), dst AS (
         |  SELECT b, sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS n_t,
         |    sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS n_r
         |  FROM dtb GROUP BY 1
         |), dtot AS (SELECT sum(n_t) AS tot_t, sum(n_r) AS tot_r FROM dst),
         |dr AS (
         |  SELECT b, CAST(floor(ln(
         |      CAST((n_t + 1) * (tot_r + 256) AS DOUBLE) /
         |      ((n_r + 1) * (tot_t + 256))) * 1000000) AS BIGINT) AS r_micro
         |  FROM dst CROSS JOIN dtot
         |), dw AS (
         |  SELECT doc_id, CAST(sum(r_micro) AS BIGINT) AS w
         |  FROM dtb JOIN dr USING (b) WHERE NOT is_t GROUP BY doc_id
         |), dws AS (
         |  SELECT CAST(sum(w) AS BIGINT) AS tot,
         |    CAST(count(*) AS BIGINT) AS n FROM dw
         |), sv7 AS (
         |  -- raw docs STRICTLY above the mean raw weight: w*n > tot
         |  -- (integer-exact, the engine's compare verbatim)
         |  SELECT s.* FROM sv6 s
         |  WHERE s.source = 'src0'
         |     OR s.doc_id IN (SELECT doc_id FROM dw CROSS JOIN dws
         |                     WHERE w * n > tot)
         |), mp AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |    CAST(sum(n_tok) AS BIGINT) AS cap_tokens
         |  FROM sv7 GROUP BY source
         |), mo AS (
         |  SELECT *,
         |    CAST(row_number() OVER (ORDER BY cap_tokens, source) - 1 AS BIGINT) AS pos0,
         |    CAST(coalesce(sum(cap_tokens) OVER (ORDER BY cap_tokens, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cap_pre,
         |    CAST(count(*) OVER () AS BIGINT) AS L,
         |    CAST(sum(n_tokens) OVER () AS BIGINT) AS B
         |  FROM mp
         |), mc AS (
         |  SELECT *, cap_tokens * (L - pos0) < B - cap_pre AS capped FROM mo
         |), mg AS (
         |  SELECT *,
         |    CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS BIGINT) AS n_capped,
         |    CAST(coalesce(sum(CASE WHEN capped THEN cap_tokens END) OVER (), 0) AS BIGINT) AS capped_tok
         |  FROM mc
         |), ma AS (
         |  SELECT *, L - n_capped AS slots, B - capped_tok AS lft FROM mg
         |), mplan AS (
         |  SELECT source,
         |    CASE WHEN capped THEN cap_tokens
         |         ELSE lft // nullif(slots, 0) +
         |              CASE WHEN pos0 >= L - (lft % nullif(slots, 0)) THEN 1 ELSE 0 END
         |    END AS planned_tokens
         |  FROM ma
         |), sh1 AS (
         |  SELECT doc_id, n_tok,
         |    CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS tokens_before,
         |    CAST(sum(n_tok) OVER () AS BIGINT) AS total
         |  FROM sv7
         |), shard AS (
         |  SELECT doc_id, n_tok,
         |    least((tokens_before * 8) // total, 7) AS shard
         |  FROM sh1
         |), ptk AS (
         |  SELECT s.doc_id, t2.tk AS ptoks FROM sv7 s JOIN toks t2 USING (doc_id)
         |), pc AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(0,
         |      CAST(floor((greatest(len(ptoks), 1) - 1) / 24.0) AS INTEGER)),
         |      i -> struct_pack(chunk_id := i,
         |                       chunk := list_slice(ptoks, i * 24 + 1, i * 24 + 32))),
         |      recursive := true)
         |  FROM ptk WHERE len(ptoks) > 0
         |), pch AS (
         |  SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
         |         CAST(len(chunk) AS INTEGER) AS n_chunk_tokens
         |  FROM pc
         |), pcum AS (
         |  SELECT doc_id % 8 AS bucket, doc_id, chunk_id, n_chunk_tokens,
         |    sum(n_chunk_tokens) OVER (PARTITION BY doc_id % 8
         |      ORDER BY doc_id, chunk_id) AS cum
         |  FROM pch
         |), packs AS (
         |  SELECT bucket, CAST((cum - n_chunk_tokens) // 256 AS BIGINT) AS seq_id,
         |    CAST(sum(n_chunk_tokens) AS BIGINT) AS n_tokens
         |  FROM pcum GROUP BY 1, 2
         |)
         |SELECT * FROM (
         |  SELECT 1 AS stage_id, 'raw' AS stage, count(*) AS n_docs,
         |    CAST(coalesce(sum(len(toks)), 0) AS BIGINT) AS n_tokens FROM c
         |  UNION ALL SELECT 2, 'quality', count(*),
         |    CAST(coalesce(sum(len(toks)), 0) AS BIGINT) FROM c WHERE kept
         |  UNION ALL SELECT 3, 'unique', count(*),
         |    CAST(coalesce(sum(len(toks)), 0) AS BIGINT) FROM c WHERE uniq
         |  UNION ALL SELECT 4, 'train', count(*),
         |    CAST(coalesce(sum(len(toks)), 0) AS BIGINT) FROM c
         |    WHERE uniq AND cohort = 'train'
         |  UNION ALL SELECT 5, 'clean', count(*),
         |    CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM sv5
         |  UNION ALL SELECT 6, 'containment', count(*),
         |    CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM sv6
         |  UNION ALL SELECT 7, 'dsir', count(*),
         |    CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM sv7
         |  UNION ALL SELECT 8, 'mix', count(*),
         |    CAST(coalesce(sum(planned_tokens), 0) AS BIGINT) FROM mplan
         |  UNION ALL SELECT 9, 'shard', count(DISTINCT shard),
         |    CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM shard
         |  UNION ALL SELECT 10, 'pack', count(*),
         |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM packs
         |) ORDER BY stage_id""".stripMargin
  }

  // ---- driver contract ------------------------------------------------

  /** Flagship: multi-timeframe candles on sf0.001 (driver smoke-checks
    * rows > 0).
    */
  def entry(spark: SparkSession): DataFrame =
    candleOut(Candles.multiTimeframe(
      Candles.transactions(spark, "/root/testdata/sf0.001")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference surface: candlestick engine ----
    "q_candle_minute" -> ((s, dir) =>
      candleOut(Candles.minuteCandles(Candles.transactions(s, dir)))),
    "q_candle_hour" -> ((s, dir) =>
      candleOut(Candles.rollup(
        Candles.minuteCandles(Candles.transactions(s, dir)), CandleTimeFrame.Hour))),
    "q_candle_day" -> ((s, dir) =>
      candleOut(Candles.rollup(
        Candles.minuteCandles(Candles.transactions(s, dir)), CandleTimeFrame.Day))),
    "q_candle_month" -> ((s, dir) =>
      candleOut(Candles.rollup(
        Candles.minuteCandles(Candles.transactions(s, dir)), CandleTimeFrame.Month))),
    "q_candle_multi_tf" -> ((s, dir) =>
      Candles.multiTimeframe(Candles.transactions(s, dir))
        .withColumn("candle_key", Candles.candleKeyDynamic)
        .select(
          col("symbol"), col("timeframe"),
          fmtTs(col("window_start")).as("window_start"),
          fmtTs(col("window_end")).as("window_end"),
          col("open"), col("high"), col("low"), col("close"),
          col("volume"), col("n_txn"), col("candle_key"))
        .orderBy(col("timeframe"), col("symbol"), col("window_start"))),
    "q_candle_range" -> ((s, dir) =>
      candleOut(CandleQueries.range(
        Candles.minuteCandles(Candles.transactions(s, dir)),
        "click", CandleTimeFrame.Minute, "2024-01-05 00:00:00", "2024-01-10 00:00:00"))),
    "q_candle_recent" -> ((s, dir) =>
      candleOut(CandleQueries.recent(
        Candles.minuteCandles(Candles.transactions(s, dir)),
        CandleTimeFrame.Minute, 5))),
    "q_candle_point" -> ((s, dir) =>
      candleOut(CandleQueries.pointLookup(
        Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
          CandleTimeFrame.Day),
        "view", CandleTimeFrame.Day, "20240115"))),
    "q_store_roundtrip" -> ((s, dir) => {
      // the complete reference workflow under the correctness gate:
      // aggregate → write the partitioned store (Redis analog) →
      // partition-pruned range read back; must equal computing the
      // range directly from raw events (the oracle does the latter)
      import graft.operators.CandleStore
      val store = java.nio.file.Files.createTempDirectory("q_store").toString
      registerScratchCleanup(store)
      CandleStore.write(
        Candles.multiTimeframe(Candles.transactions(s, dir)), store)
      candleOut(CandleStore.range(s, store, "purchase", CandleTimeFrame.Hour,
        "2024-01-10 00:00:00", "2024-01-20 00:00:00")
        .select(Candles.candleColumns: _*))
    }),
    "q_store_recent" -> ((s, dir) => {
      // store-backed recent-N: the materialized-store variant of
      // q_candle_recent — the store is built once per process
      // (candleStoreOnce) so the graded cost is the partition-pruned
      // read; must equal the direct computation (the oracle's path)
      import graft.operators.CandleStore
      candleOut(CandleStore.recent(s, candleStoreOnce(s, dir), CandleTimeFrame.Minute, 5)
        .select(Candles.candleColumns: _*))
    }),
    "q_store_point" -> ((s, dir) => {
      // store-backed point lookup (reference's Redis key get ≙
      // partition-pruned scan + key-format equality); store built once
      // per process — the graded cost is the pruned lookup
      import graft.operators.CandleStore
      candleOut(CandleStore.point(s, candleStoreOnce(s, dir), "view",
          CandleTimeFrame.Day, "20240115")
        .select(Candles.candleColumns: _*))
    }),
    "q_symbols" -> ((s, dir) =>
      CandleQueries.symbols(Candles.transactions(s, dir)).orderBy(col("symbol"))),
    "q_candle_keys" -> ((s, dir) => {
      // key enumeration over a materialized store (reference
      // getSymbolCandleKeys, CandleStickService.kt:185-187): the
      // multi-timeframe store is built once per process, then one
      // symbol's keys are enumerated — the symbol filter prunes to its
      // partitions across all four timeframes (the graded cost, the
      // Redis-prefix-scan analogue); the oracle rebuilds the same
      // candle:{symbol}:{tf}:{dateKey} strings from raw events
      import graft.operators.CandleStore
      CandleStore.candleKeys(s, candleStoreOnce(s, dir), Some("view"), None)
    }),
    "q_stream_candles" -> ((s, dir) => {
      // the SAME minute-candle semantics through Structured Streaming;
      // complete-mode memory sink ⇒ directly comparable to the batch
      // oracle (graft.streaming.CandleStream scaladoc)
      import graft.streaming.CandleStream
      val txns = Tables.eventsStream(s, dir).select(
        col("event_type").as("symbol"),
        col("value").as("price"),
        get_json_object(col("props"), "$.k").cast("int").as("quantity"),
        col("ts"))
      s.catalog.dropTempView("q_stream_candles_sink")
      candleOut(CandleStream.runBoundedToMemory(s,
        CandleStream.candles(txns, CandleTimeFrame.Minute),
        "q_stream_candles_sink"))
    }),

    // ---- general engine surface ----
    "q1_agg" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          money(sum(col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .withColumn("avg_price", col("sum_base_price") / col("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          col("sum_base_price"), col("sum_disc_price"), col("avg_qty"),
          col("avg_price"), col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- market analytics over the trade stream ----
    "q_vwap" -> ((s, dir) =>
      MarketAnalytics.vwap(Candles.transactions(s, dir))
        .select(col("symbol"), fmtTs(col("window_start")).as("window_start"),
          col("pv"), col("volume"), col("vwap"))
        .orderBy(col("symbol"), col("window_start"))),
    "q_candle_change" -> ((s, dir) => {
      val day = Candles.rollup(
        Candles.minuteCandles(Candles.transactions(s, dir)), CandleTimeFrame.Day)
      import org.apache.spark.sql.expressions.Window
      val bySym = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
      val trailing = bySym.rowsBetween(-4, 0)
      // moving average via exact decimal sum / exact count: immune to
      // the engines' different sliding-frame accumulation orders
      day
        .withColumn("prev_close", lag(col("close"), 1).over(bySym))
        .withColumn("change", col("close") - col("prev_close"))
        .withColumn("ma_close",
          sum(col("close").cast("decimal(18,4)")).over(trailing).cast("double") /
            count(col("close")).over(trailing))
        .select(col("symbol"), fmtTs(col("window_start")).as("window_start"),
          col("close"), col("prev_close"), col("change"), col("ma_close"))
        .orderBy(col("symbol"), col("window_start"))
    }),
    "q_candle_patterns" -> ((s, dir) =>
      // candlestick pattern flags (doji / hammer / engulfing) over the
      // daily series — exact IEEE compare arithmetic on selection-exact
      // OHLC, so the oracle replays the rules bit-for-bit
      MarketAnalytics.patterns(
          Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
            CandleTimeFrame.Day))
        .withColumn("window_start", fmtTs(col("window_start")))
        .orderBy(col("symbol"), col("window_start"))),
    "q_range_join" -> ((s, dir) => {
      // events range-joined into day-candle windows; the per-window
      // count must reproduce the candle's own n_txn — a self-checking
      // operator (plus the DuckDB BETWEEN-join oracle)
      val txns = Candles.transactions(s, dir)
      val day = Candles.rollup(Candles.minuteCandles(txns), CandleTimeFrame.Day)
        .select(col("symbol"), col("window_start"), col("window_end"), col("n_txn"))
      graft.operators.RangeJoin
        .intervalJoin(txns, "ts", day, "window_start", "window_end",
          Seq("symbol"), grainSeconds = 86400)
        .groupBy(col("symbol"), col("window_start"), col("n_txn"))
        .agg(count(lit(1)).as("n_matched"))
        .select(col("symbol"), fmtTs(col("window_start")).as("window_start"),
          col("n_txn"), col("n_matched"))
        .orderBy(col("symbol"), col("window_start"))
    }),
    "q_asof_join" -> ((s, dir) => {
      // each trade gets the close of the last COMPLETED hour candle
      // (window_end ≤ trade ts) — "price context at event time"
      val txns = Tables.events(s, dir).select(
        col("event_id"), col("event_type").as("symbol"),
        col("value").as("price"), col("ts"))
      val hourly = Candles.rollup(
        Candles.minuteCandles(Candles.transactions(s, dir)), CandleTimeFrame.Hour)
        .select(col("symbol"), col("window_end").as("ts"),
          col("close").as("prev_hour_close"))
      graft.operators.AsOfJoin.asofBackward(txns, hourly, Seq("symbol"), "ts")
        .select(col("event_id"), col("symbol"), fmtTs(col("ts")).as("ts"),
          col("price"), col("asof_prev_hour_close"))
        .orderBy(col("event_id"))
    }),
    "q_candle_5min" -> ((s, dir) =>
      candleOut(Candles.rollupInterval(
        Candles.minuteCandles(Candles.transactions(s, dir)), 300))),
    "q_candle_gapfill" -> ((s, dir) =>
      Candles.gapFill(
        Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
          CandleTimeFrame.Hour), 3600)
        .select(col("symbol"), fmtTs(col("window_start")).as("window_start"),
          col("close_filled"), col("is_gap"), col("volume"))
        .orderBy(col("symbol"), col("window_start"))),
    "q_candle_hop" -> ((s, dir) =>
      // sliding-window candles: 10-minute OHLCV advancing every 5 —
      // native window(width, slide) assigns each txn to its 2 windows
      // at the scan (bounded explode in codegen), then the same
      // one-shuffle partial-aggregated OHLCV as the tumbling path
      candleOut(Candles.hopCandles(Candles.transactions(s, dir), 600, 300))),
    "q_movers" -> ((s, dir) =>
      MarketAnalytics.topMovers(
        Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
          CandleTimeFrame.Day), k = 2)
        .select(fmtTs(col("window_start")).as("day"), col("symbol"),
          col("direction"), col("return"))
        .orderBy(col("day"), col("direction"), col("symbol"))),
    "q_correlation" -> ((s, dir) =>
      MarketAnalytics.returnCorrelation(
        Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
          CandleTimeFrame.Day))
        .orderBy(col("sym_a"), col("sym_b"))),
    "q_drawdown" -> ((s, dir) =>
      // worst peak-to-trough decline per symbol (running-max window +
      // min_by trough day, earliest-day tiebreak)
      MarketAnalytics.maxDrawdown(
        Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
          CandleTimeFrame.Day))
        .select(col("symbol"), col("max_drawdown"),
          fmtTs(col("trough_day")).as("trough_day"))
        .orderBy(col("symbol"))),
    "q_lag_features" -> ((s, dir) => {
      // feature-engineering materialization for model training: per
      // (symbol, day) lagged returns, trailing-7 moving average and
      // volatility — all windows share one (symbol, time) partitioning
      // (single exchange), moments decimal-exact so every emitted
      // double is bit-reproducible
      import org.apache.spark.sql.expressions.Window
      val bySym = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
      val trail7 = bySym.rowsBetween(-6, 0)
      val day = Candles.rollup(
        Candles.minuteCandles(Candles.transactions(s, dir)), CandleTimeFrame.Day)
      day
        .withColumn("prev_close", lag(col("close"), 1).over(bySym))
        .withColumn("ret",
          when(col("prev_close").isNotNull && col("prev_close") =!= 0.0,
            (col("close") / col("prev_close") - 1.0).cast("decimal(18,6)")))
        .withColumn("ret_lag1", lag(col("ret"), 1).over(bySym))
        .withColumn("ma7",
          sum(col("close").cast("decimal(18,2)")).over(trail7).cast("double") /
            count(col("close")).over(trail7))
        .withColumn("__n", count(col("ret")).over(trail7))
        .withColumn("__sx", sum(col("ret")).over(trail7).cast("double"))
        .withColumn("__sxx",
          sum((col("ret") * col("ret")).cast("decimal(38,6)")).over(trail7)
            .cast("double"))
        .withColumn("vol7",
          when(col("__n") > 1, sqrt(greatest(
            (col("__sxx") - col("__sx") * col("__sx") / col("__n")) /
              (col("__n") - 1), lit(0.0)))))
        .select(col("symbol"), fmtTs(col("window_start")).as("day"),
          col("ret").cast("double").as("ret"),
          col("ret_lag1").cast("double").as("ret_lag1"),
          col("ma7"), col("vol7"))
        .orderBy(col("symbol"), col("day"))
    }),
    "q_spearman" -> ((s, dir) =>
      // rank correlation of daily returns — fully BIGINT-exact
      // (integer ranks, positive-only divisions)
      MarketAnalytics.spearmanCorrelation(
        Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
          CandleTimeFrame.Day))
        .orderBy(col("sym_a"), col("sym_b"))),
    "q_beta" -> ((s, dir) =>
      // CAPM-style market beta per symbol vs the 'view' series as
      // market proxy — decimal-exact moments, benchmark broadcast
      MarketAnalytics.betaVsBenchmark(
        Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
          CandleTimeFrame.Day), benchmark = "view")
        .orderBy(col("symbol"))),
    "q_bollinger" -> ((s, dir) =>
      MarketAnalytics.bollinger(
        Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
          CandleTimeFrame.Day), n = 20)
        .select(col("symbol"), fmtTs(col("window_start")).as("window_start"),
          col("close"), col("ma"), col("sd"), col("upper"), col("lower"))
        .orderBy(col("symbol"), col("window_start"))),
    "q_rsi" -> ((s, dir) =>
      MarketAnalytics.rsi(
        Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
          CandleTimeFrame.Day), n = 14)
        .select(col("symbol"), fmtTs(col("window_start")).as("window_start"),
          col("close"), col("rsi"))
        .orderBy(col("symbol"), col("window_start"))),
    "q_ema" -> ((s, dir) =>
      MarketAnalytics.ema(
        Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
          CandleTimeFrame.Day), span = 12)
        .select(col("symbol"), fmtTs(col("window_start")).as("window_start"),
          col("close"), col("ema"))
        .orderBy(col("symbol"), col("window_start"))),
    "q_rsi_wilder" -> ((s, dir) =>
      MarketAnalytics.wilderRsi(
        Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
          CandleTimeFrame.Day), n = 14)
        .select(col("symbol"), fmtTs(col("window_start")).as("window_start"),
          col("close"), col("rsi_wilder"))
        .orderBy(col("symbol"), col("window_start"))),
    "q_macd" -> ((s, dir) =>
      MarketAnalytics.macd(
        Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
          CandleTimeFrame.Day))
        .select(col("symbol"), fmtTs(col("window_start")).as("window_start"),
          col("close"), col("macd"), col("macd_signal"), col("macd_hist"))
        .orderBy(col("symbol"), col("window_start"))),
    "q_stochastic" -> ((s, dir) =>
      MarketAnalytics.stochastic(
        Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
          CandleTimeFrame.Day), n = 14)
        .select(col("symbol"), fmtTs(col("window_start")).as("window_start"),
          floor(col("pct_k") * 1e6).cast("long").as("pct_k_micro"),
          floor(col("pct_d") * 1e6).cast("long").as("pct_d_micro"))
        .orderBy(col("symbol"), col("window_start"))),
    "q_atr" -> ((s, dir) =>
      MarketAnalytics.atr(
        Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
          CandleTimeFrame.Day), n = 14)
        .select(col("symbol"), fmtTs(col("window_start")).as("window_start"),
          col("close"), col("atr"))
        .orderBy(col("symbol"), col("window_start"))),
    "q_obv" -> ((s, dir) =>
      MarketAnalytics.obv(
        Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
          CandleTimeFrame.Day))
        .select(col("symbol"), fmtTs(col("window_start")).as("window_start"),
          col("close"), col("volume"), col("obv"))
        .orderBy(col("symbol"), col("window_start"))),
    "q_session_window" -> ((s, dir) =>
      // the built-in gap-based session_window (works batch AND
      // streaming) — same sessions as MarketAnalytics.sessionize, with
      // window end = last event + gap
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,4)")).cast("decimal(38,2)")
            .cast("double").as("total_value"))
        .select(col("user_id"),
          fmtTs(col("w.start")).as("session_start"),
          fmtTs(col("w.end")).as("session_end"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("session_start"))),
    "q_sessionize" -> ((s, dir) =>
      MarketAnalytics.sessionStats(
        Tables.events(s, dir).select(col("user_id"), col("ts"), col("value")),
        "user_id", "ts", 30)
        .select(col("user_id"), col("session_seq"),
          fmtTs(col("session_start")).as("session_start"),
          fmtTs(col("session_end")).as("session_end"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("session_seq"))),

    // ---- general engine: joins / windows / shaping ----
    "q3_join" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(money(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))))
          .as("revenue"))
        .select(col("l_orderkey"), fmtTs(col("o_orderdate")).as("o_orderdate"),
          col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    "q5_multijoin" -> ((s, dir) => {
      // dim chain broadcast: region ⋈ nation stays tiny, so the
      // customer join key list is broadcast too; only orders⋈lineitem
      // shuffles at scale
      val asia = broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA"))
      val nat = broadcast(Tables.nation(s, dir)
        .join(asia, col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name")))
      val cust = Tables.customer(s, dir)
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      Tables.lineitem(s, dir)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("n_name"))
        .agg(money(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),
    "q_topk_group" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.part(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("p_brand"), col("rk"), col("p_partkey"), col("p_name"),
          col("p_retailprice"))
        .orderBy(col("p_brand"), col("rk"))
    }),
    "q_histogram" -> ((s, dir) =>
      // fixed-width price histogram (integer bucket arithmetic — exact)
      Tables.lineitem(s, dir)
        .select((floor(col("l_extendedprice") / 10000).cast("int") * 10000).as("bucket_lo"))
        .groupBy(col("bucket_lo"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket_lo"))),
    "q_cube" -> ((s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("decimal(38,2)")
            .cast("double").as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority"))),
    "q_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("returnflag"), col("linestatus"))),
    "q_range_window" -> ((s, dir) => {
      // time-RANGE window frame (not row-count): trailing 3-day volume
      // and txn totals per symbol over day candles — frames defined by
      // event-time distance survive gaps in the series
      import org.apache.spark.sql.expressions.Window
      val day = Candles.rollup(
        Candles.minuteCandles(Candles.transactions(s, dir)), CandleTimeFrame.Day)
      val w = Window.partitionBy(col("symbol"))
        .orderBy(unix_timestamp(col("window_start")))
        .rangeBetween(-3L * 86400L, 0L)
      day
        .withColumn("vol_3d", sum(col("volume")).over(w))
        .withColumn("txn_3d", sum(col("n_txn")).over(w))
        .select(col("symbol"), fmtTs(col("window_start")).as("window_start"),
          col("volume"), col("vol_3d"), col("txn_3d"))
        .orderBy(col("symbol"), col("window_start"))
    }),
    "q_grouping_sets" -> ((s, dir) => {
      // explicit GROUPING SETS (the general form ROLLUP/CUBE sugar):
      // (flag, status), (flag), (status). Spark plans GROUPING SETS as
      // Expand (one copy of every input row per set) BELOW the partial
      // aggregate, so the naive form pays the 3× row multiplier on the
      // whole fact scan (measured: the r32 scaling outlier in round 4).
      // All three sets are decomposable from the finest one, so
      // pre-aggregate to (flag, status) first — the Expand then runs
      // over the ~8-row base, not the fact table, and the scan-side
      // partial agg is an ordinary 8-group hash agg. Sums stay
      // unrounded DECIMAL until the final per-set round, so results
      // are bit-identical to the direct form (and the oracle's).
      Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
      s.sql("""
        WITH base AS (
          SELECT l_returnflag, l_linestatus,
                 sum(CAST(l_quantity AS DECIMAL(18,4))) AS s,
                 count(*) AS cnt
          FROM v_lineitem
          GROUP BY l_returnflag, l_linestatus
        )
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               CAST(CAST(round(sum(s), 2) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
               sum(cnt) AS n
        FROM base
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus))
        ORDER BY returnflag, linestatus""")
    }),
    "q_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),
    "q_semi_anti" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val ordKeys = Tables.orders(s, dir).select(col("o_custkey"))
      val withO = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_orders"))
      val without = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without_orders"))
      withO.join(without, Seq("c_mktsegment"), "full_outer")
        .select(col("c_mktsegment"),
          coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
          coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
        .orderBy(col("c_mktsegment"))
    }),
    "q_large_orders" -> ((s, dir) => {
      // TPC-H Q18 shape: orders whose total lineitem quantity clears a
      // threshold (aggregate-filtered key set → semi-join back to the
      // fact/dim chain). The aggregate runs BEFORE the joins, so only
      // qualifying keys flow into them — at scale this is a tiny
      // broadcast of big-order keys, never a fact×fact join.
      val bigKeys = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 150.0)
      Tables.orders(s, dir)
        .join(bigKeys, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"),
          fmtTs(col("o_orderdate")).as("o_orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(20)
    }),
    "q_exists_agg" -> ((s, dir) => {
      // TPC-H Q4 shape: order-priority counts for orders with at least
      // one returned lineitem (EXISTS ≙ left-semi join on the fact key)
      val returned = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      Tables.orders(s, dir)
        .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),
    "q7_nation_volume" -> ((s, dir) => {
      // TPC-H Q7 shape: bilateral trade volume between nation pairs —
      // the fact table feeds two independent dimension chains
      // (supplier→nation and orders→customer→nation). Nation is
      // broadcast twice under different aliases; supplier/customer/
      // orders join by key (AQE picks broadcast when they fit); only
      // the fact shuffles into the final 3-key rollup.
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp")))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(money(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))))
          .as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),
    "q_supplier_cnt" -> ((s, dir) => {
      // TPC-H Q16 shape: distinct suppliers per part bucket, minus a
      // complaint cohort — NOT IN ≙ left-anti join BEFORE the distinct
      // aggregate, so excluded suppliers never inflate the shuffle
      val complaints = Tables.supplier(s, dir)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).filter(col("p_brand") =!= "Brand#1"),
          col("l_partkey") === col("p_partkey"))
        .join(complaints, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
    }),
    "q_value_share" -> ((s, dir) => {
      // TPC-H Q11 shape: groups whose aggregate clears a threshold on
      // the GLOBAL aggregate. The naive scalar-subquery form (WITH pv
      // ... WHERE value*2*(SELECT COUNT(*) FROM pv) > (SELECT
      // SUM(value) FROM pv)*3) executes the FACT aggregate three
      // times — measured on the final adaptive plan: 3 lineitem
      // scans, zero ReusedExchange/ReusedSubquery, because each
      // scalar subquery is planned separately. This form computes the
      // global count+sum as ONE WINDOW pass over the group frame:
      // one fact scan total (the q_corr_subquery query keeps the
      // spark.sql subquery surface covered). Same ceiling note as
      // q_top_supplier for extreme group cardinality. The gate is
      // relative to the MEAN (value > 1.5×mean) so it is
      // scale-factor-invariant. The compare runs in DOUBLE: a
      // decimal×count product would trip Spark's precision-cap scale
      // adjustment (≠ DuckDB), while the closest group to the
      // 1.5×mean boundary sits ≥2.8e-6 relative away at either SF —
      // nine orders above double rounding, so the predicate is
      // engine-independent; the OUTPUT value stays decimal-exact.
      // The global count+sum ride Ranks.withGlobalAgg (persisted
      // group frame, 1-row broadcast back): one fact scan, and no
      // single-partition window over the part-grain frame.
      val pv = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
          col("l_quantity").cast("decimal(18,4)")).as("value"))
      graft.operators.Ranks.withGlobalAgg(pv,
          Seq(count(lit(1)).as("n_groups"), sum(col("value")).as("total")))
        .filter(col("value").cast("double") * 2 * col("n_groups") >
          col("total").cast("double") * 3)
        .select(col("l_partkey"), money(col("value")).as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    }),
    "q_argmax_join" -> ((s, dir) => {
      // TPC-H Q2 shape, decorrelated: each nation's max-balance
      // supplier(s) via aggregate + join-back on (key, max) equality —
      // the argmax idiom when the payload must come from the original
      // row (contrast q_topk_group's window form). Ties keep all rows.
      val mx = Tables.supplier(s, dir)
        .groupBy(col("s_nationkey")).agg(max(col("s_acctbal")).as("max_bal"))
      Tables.supplier(s, dir)
        .join(mx, Seq("s_nationkey"))
        .filter(col("s_acctbal") === col("max_bal"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .orderBy(col("n_name"), col("s_suppkey"))
    }),
    "q_small_qty" -> ((s, dir) => {
      // TPC-H Q17 shape: revenue from lineitems whose quantity is
      // below HALF the part's average — per-part aggregate joined back
      // to the fact on the grouping key (the correlated-scalar-
      // subquery shape, decorrelated). The threshold compare is
      // cross-multiplied into pure BIGINT (2·qty·cnt < sum_qty):
      // integer-exact in any engine, no avg rounding at the boundary.
      // Both join inputs arrive partitioned on the part key (the
      // aggregate's exchange is reused), and the p_size cohort filter
      // pushes into the part scan.
      val perPart = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("cnt"))
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).filter(col("p_size") < 10),
          col("l_partkey") === col("p_partkey"))
        .join(perPart, "l_partkey")
        .filter(col("l_quantity").cast("long") * col("cnt") * 2 < col("sum_qty"))
        .agg(dsum(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),
    "q_stock_reserve" -> ((s, dir) => {
      // TPC-H Q20 shape: suppliers holding an "excess position" in any
      // small part (per-(supplier, part) shipped quantity over a
      // threshold), restricted to one nation. The nested aggregate
      // runs FIRST and only its qualifying supplier keys reach the
      // semi-join — the supplier table is never joined to the fact.
      val excess = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).filter(col("p_name").like("small%")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("sq"))
        .filter(col("sq") > 50)
        .select(col("l_suppkey"))
      Tables.supplier(s, dir)
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    }),
    "q_waiting_supplier" -> ((s, dir) => {
      // TPC-H Q21 shape: suppliers who were the SOLE late shipper on
      // multi-supplier orders (late = shipped >60 days after the
      // order date). The classic EXISTS + NOT-EXISTS double self-join
      // decorrelates into per-(order, supplier) late flags; the
      // per-order rollup rides as WINDOWS over the same flags frame
      // (not an aggregate joined back), so the fact⋈orders join runs
      // ONCE — the only extra exchange ships the flags-sized frame,
      // and no fact×fact join exists.
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey"))
      val perSupp = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1L).otherwise(0L))
          .as("late"))
      perSupp
        .withColumn("n_supp", count(lit(1)).over(wOrd))
        .withColumn("n_late", sum(col("late")).over(wOrd))
        .filter(col("late") === 1L && col("n_supp") >= 2 && col("n_late") === 1L)
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(25)
    }),
    "q_idle_customers" -> ((s, dir) => {
      // TPC-H Q22 shape: above-average-balance customers in target
      // segments who never ordered — scalar-subquery threshold
      // (broadcast 1-row aggregate) + anti join. The balance compare
      // is cross-multiplied in integer cents (cents·n > Σcents):
      // bit-exact in any engine, no avg/decimal boundary risk.
      val cust = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
        .withColumn("cents", floor(col("c_acctbal") * 100 + 0.5).cast("long"))
      val pos = cust.filter(col("c_acctbal") > 0)
        .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("n_pos"))
      cust.crossJoin(broadcast(pos))
        .filter(col("cents") * col("n_pos") > col("sum_cents"))
        .join(Tables.orders(s, dir).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
        .orderBy(col("c_mktsegment"))
    }),
    "q_filter_agg" -> ((s, dir) =>
      // TPC-H Q6 shape: pure predicate aggregation — every filter
      // pushes into the parquet scan (PushedFilters), the agg is a
      // one-row partial+final, nothing else shuffles. The floor of
      // what a scan-bound query costs.
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(money(sum(col("l_extendedprice").cast("decimal(18,4)") *
          col("l_discount").cast("decimal(18,4)"))).as("revenue"),
          count(lit(1)).as("n_lines"))),
    "q_returned_revenue" -> ((s, dir) => {
      // TPC-H Q10 shape: revenue lost to returns per customer — the
      // quarter filter prunes orders BEFORE the fact join, nation
      // broadcasts, top-20 via TakeOrderedAndProject (no global sort)
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(revenueSum.as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),
    "q_priority_class" -> ((s, dir) =>
      // TPC-H Q12 shape (linestatus standing in for shipmode):
      // conditional counts after the fact⋈orders join — one shuffle,
      // the CASE aggregation is map-side partial
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))),
    "q_custdist" -> ((s, dir) =>
      // TPC-H Q13 shape: order-count distribution — LEFT OUTER join
      // keeps zero-order customers, double aggregation (per-customer
      // count, then count-of-counts; the second group is tiny)
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir)
          .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
          .select(col("o_orderkey"), col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)),
    "q_promo_share" -> ((s, dir) =>
      // TPC-H Q14 shape: promo revenue share in a month. Both sums are
      // 2dp-stabilized decimals; the share is a floor-to-micro-units
      // integer over bit-identical doubles, so the division is
      // engine-independent.
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          money(sum(when(col("p_type") === "PROMO",
            col("l_extendedprice").cast("decimal(18,4)") *
              (lit(1).cast("decimal(18,4)") -
                col("l_discount").cast("decimal(18,4)"))))).as("promo_rev"),
          revenueSum.as("total_rev"))
        .withColumn("promo_micro",
          floor(col("promo_rev") / col("total_rev") * 1e6).cast("long"))),
    "q_top_supplier" -> ((s, dir) => {
      // TPC-H Q15 shape: the top-revenue supplier of a quarter —
      // per-supplier aggregate, then the global max via
      // Ranks.withGlobalAgg: the aggregate is PERSISTED while the
      // 1-row max reduces over it (partial-aggregatable) and
      // broadcast back, so the fact scans once, nothing re-executes
      // (the naive max + join-back form without the persist scans the
      // fact twice — no AQE exchange reuse, measured), and no
      // supplier-grain frame ever funnels through a single window
      // partition. DECIMAL equality (exact within each engine; ties
      // all surface).
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .as("rev_d"))
      graft.operators.Ranks.withGlobalAgg(rev, Seq(max(col("rev_d")).as("max_rev")))
        .filter(col("rev_d") === col("max_rev"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), money(col("rev_d")).as("total_rev"))
        .orderBy(col("s_suppkey"))
    }),
    "q_disjunctive" -> ((s, dir) =>
      // TPC-H Q19 shape: OR-of-AND predicate push — the join stays a
      // single broadcast hash join with the disjunction evaluated as
      // one codegen'd filter, not three plans unioned
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#15" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(revenueSum.as("revenue"), count(lit(1)).as("n_lines"))),
    "q_market_share" -> ((s, dir) => {
      // TPC-H Q8 shape: one nation's share of in-region revenue per
      // order year. Two independent dimension chains touch the same
      // fact (customer-side region gate, supplier-side nation name)
      // — nation broadcasts twice under aliases, the fact shuffles
      // only for its two key joins.
      val custIn = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val suppNat = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("supp_nation"))
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year"))
      Tables.lineitem(s, dir)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(custIn, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(suppNat, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_year"))
        .agg(
          money(sum(when(col("supp_nation") === "NATION_3",
            col("l_extendedprice").cast("decimal(18,4)") *
              (lit(1).cast("decimal(18,4)") -
                col("l_discount").cast("decimal(18,4)"))))).as("nation_rev"),
          revenueSum.as("total_rev"))
        .withColumn("share_micro",
          floor(col("nation_rev") / col("total_rev") * 1e6).cast("long"))
        .orderBy(col("o_year"))
    }),
    "q_supplier_profit" -> ((s, dir) =>
      // TPC-H Q9 shape (retailprice-based cost proxy; no partsupp in
      // the schema): profit per supplier nation per year over a
      // part-name cohort. All terms are exact decimal products, so the
      // sum is order-independent in both engines.
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .filter(col("p_name").like("%bolt%"))
          .select(col("p_partkey"), col("p_retailprice"))),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(money(sum(
          col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")) -
          col("p_retailprice").cast("decimal(18,4)") *
            col("l_quantity").cast("decimal(18,4)") *
            lit(0.05).cast("decimal(18,4)"))).as("profit"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_name"), col("o_year"))),
    "q_concurrency" -> ((s, dir) => {
      // peak concurrent user sessions per day — sweep-line over
      // session boundaries, running sum partitioned by day + a tiny
      // day-carry (no single-partition global window)
      val sess = MarketAnalytics
        .sessionize(Tables.events(s, dir), "user_id", "ts", gapMinutes = 30)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      MarketAnalytics.peakConcurrency(sess)
        .select(col("day").cast("string").as("day"), col("peak_concurrency"))
        .orderBy(col("day"))
    }),
    "q_funnel" -> ((s, dir) =>
      // ordered view→click→purchase funnel by first-view cohort day —
      // running-min windows + rollup over ONE shuffle (no per-stage
      // fact self-joins)
      graft.operators.Funnel.report(Tables.events(s, dir))
        .orderBy(col("cohort_day"))),
    "q_top_paths" -> ((s, dir) => {
      // session path mining: most common 3-step event sequences
      // inside a session — per-session ordered type array (sorted
      // struct collect, one shuffle), trigrams via posexplode +
      // element_at (codegen builtins, the cooccur technique — no
      // lambda transform on the exploded path)
      val sess = MarketAnalytics.sessionize(
        Tables.events(s, dir), "user_id", "ts", gapMinutes = 30)
      val perSess = sess
        .groupBy(col("user_id"), col("session_seq"))
        .agg(sort_array(collect_list(struct(col("ts"), col("event_type"))))
          .as("evs"))
        .select(col("evs").getField("event_type").as("types"))
      perSess
        .select(col("types"), posexplode(col("types")).as(Seq("i", "t1")))
        .filter(col("i") <= size(col("types")) - 3)
        .select(concat_ws(">", col("t1"),
          element_at(col("types"), col("i") + 2),
          element_at(col("types"), col("i") + 3)).as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(20)
    }),
    "q_markov" -> ((s, dir) => {
      // session transition matrix: P(next event type | current) with
      // integer-exact probabilities — adjacency is one lead() over
      // the session ordering the sessionize window already set up;
      // row-normalization is a window over the tiny type×type grid
      val sess = MarketAnalytics.sessionize(
        Tables.events(s, dir), "user_id", "ts", gapMinutes = 30)
      import org.apache.spark.sql.expressions.Window
      // event_type tiebreak: same-timestamp events would otherwise
      // order arbitrarily (engine-divergent transition counts)
      val bySess = Window.partitionBy(col("user_id"), col("session_seq"))
        .orderBy(col("ts"), col("event_type"))
      sess
        .withColumn("next_type", lead(col("event_type"), 1).over(bySess))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p_micro",
          expr("n * 1000000 div sum(n) over (partition by from_type)"))
        .orderBy(col("from_type"), col("to_type"))
    }),
    "q_ltv_deciles" -> ((s, dir) => {
      // user-value segmentation: users ranked into deciles by total
      // purchase value, then a per-decile rollup; revenue sums
      // decimal-exact. The decile is Ranks.ntileExact — bit-equal to
      // ntile(10) over (order by spend desc, user_id) but with every
      // window PARTITIONED (cutpoint-bucketed two-level rank), so the
      // user-grain frame never funnels through one task at 100 TB.
      val perUser = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("spend"),
          count(lit(1)).as("n_purchases"))
      graft.operators.Ranks.ntileExact(perUser, 10, "spend", "user_id", out = "decile")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_users"),
          money(sum(col("spend"))).as("total_spend"),
          sum(col("n_purchases")).as("n_purchases"))
        .orderBy(col("decile"))
    }),
    "q_funnel_time" -> ((s, dir) => {
      // time-to-convert: exact p50/p90 of the view→click and
      // click→purchase latencies (integer seconds) over the staged
      // funnel — Funnel's one-shuffle stage timestamps feed the
      // sort-based exact quantile, one row per transition
      val stages = graft.operators.Funnel.userStages(Tables.events(s, dir))
      val d1 = stages.filter(col("t_click").isNotNull)
        .select(lit("view_to_click").as("transition"),
          (unix_timestamp(col("t_click")) - unix_timestamp(col("t_view"))).as("sec"))
      val d2 = stages.filter(col("t_purchase").isNotNull)
        .select(lit("click_to_purchase").as("transition"),
          (unix_timestamp(col("t_purchase")) - unix_timestamp(col("t_click"))).as("sec"))
      val deltas = d1.unionByName(d2)
      graft.operators.Percentiles.exact(
          deltas, Seq("transition"), "sec", Seq(0.5, 0.9), Seq("p50_sec", "p90_sec"))
        .join(broadcast(deltas.groupBy(col("transition")).agg(count(lit(1)).as("n"))),
          "transition")
        .select(col("transition"), col("n"), col("p50_sec"), col("p90_sec"))
        .orderBy(col("transition"))
    }),
    "q_retention" -> ((s, dir) =>
      // day-1 / day-7 cohort retention: one shuffle on user_id builds
      // (cohort day, active-day set) per user — no fact self-join, no
      // per-offset rescans
      Retention.cohortRetention(Tables.events(s, dir), Seq(1, 7))
        .select(col("cohort_day").cast("string").as("cohort_day"),
          col("n_users"), col("d1"), col("d7"))
        .orderBy(col("cohort_day"))),
    "q_rolling_users" -> ((s, dir) =>
      // exact 7-day rolling distinct users per day — the sliding
      // COUNT(DISTINCT) inverted into bounded per-activity
      // contributions (explode ×7 of the distinct user-day grid), so
      // it is a plain partial-aggregated distinct count, not a
      // fact×fact interval join
      Retention.rollingDistinctUsers(Tables.events(s, dir), 7)
        .select(col("day").cast("string").as("day"), col("active_users"))
        .orderBy(col("day"))),
    "q_cumulative_users" -> ((s, dir) =>
      // users-to-date growth curve: cumulative COUNT(DISTINCT) as
      // first-seen day + running sum over the day-cardinality frame
      // (the global window holds one row per calendar day)
      Retention.cumulativeUsers(Tables.events(s, dir))
        .select(col("day").cast("string").as("day"),
          col("new_users"), col("cum_users"))
        .orderBy(col("day"))),
    "q_pagerank" -> ((s, dir) => {
      // iterative graph analytics beyond connected components:
      // integer-unit PageRank (bit-deterministic — FP PageRank is
      // accumulation-order-dependent and could never hash-match) over
      // the customer↔supplier order graph, 3 fixed iterations, one
      // edge shuffle per iteration, top-50
      val edges = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .filter(year(col("o_orderdate")) === 1996)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      graft.operators.Graphs.integerPageRank(edges, iters = 3)
        .orderBy(col("pr_int").desc, col("node")).limit(50)
    }),
    "q_dq_report" -> ((s, dir) => {
      // data-quality audit: constraint checks (referential integrity
      // via anti-joins, key uniqueness via aggregate-filter, range
      // and null checks as scan-side predicates) unioned into one
      // (check, n_violations) report — each branch is a pushed-filter
      // scan or broadcast/shuffle anti-join ending in a 1-row count
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val ev = Tables.events(s, dir)
      def check(name: String, c: DataFrame): DataFrame =
        c.agg(count(lit(1)).as("n_violations"))
          .select(lit(name).as("check"), col("n_violations"))
      check("lineitem_orphan_orderkey",
        li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti"))
        .unionByName(check("orders_orphan_custkey",
          ord.join(cust, ord("o_custkey") === cust("c_custkey"), "left_anti")))
        .unionByName(check("orders_duplicate_pk",
          ord.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
            .filter(col("c") > 1)))
        .unionByName(check("lineitem_nonpositive_price",
          li.filter(col("l_extendedprice") <= 0)))
        .unionByName(check("lineitem_discount_range",
          li.filter(col("l_discount") < 0 || col("l_discount") > 1)))
        .unionByName(check("events_null_user",
          ev.filter(col("user_id").isNull)))
        .orderBy(col("check"))
    }),
    "q_latest_snapshot" -> ((s, dir) =>
      // the lakehouse current-view primitive: latest record per key —
      // one max_by aggregate (partial, map-side combined), NOT a
      // row_number window (no per-key sort, no rank shuffle beyond
      // the aggregate's own)
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(fmtTs(max(col("ts"))).as("last_ts"),
          // (ts, value) ordering breaks same-timestamp ties
          // deterministically — engine-independent even if the
          // generator ever emits duplicate (key, ts) rows
          max_by(col("value"), struct(col("ts"), col("value"))).as("last_value"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("event_type"))),
    "q_seasonality" -> ((s, dir) =>
      // hour-of-day activity profile per event type: calendar
      // extraction + one map-side-combined shuffle; the share is
      // integer-exact micro units over a per-type window on the tiny
      // (type × 24) aggregate
      Tables.events(s, dir)
        .groupBy(col("event_type"), hour(col("ts")).as("hh"))
        .agg(count(lit(1)).as("n"))
        .withColumn("share_micro",
          expr("n * 1000000 div sum(n) over (partition by event_type)"))
        .orderBy(col("event_type"), col("hh"))),
    "q_pivot" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).cast("string").as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .select(col("day"),
          coalesce(col("click"), lit(0L)).as("click"),
          coalesce(col("error"), lit(0L)).as("error"),
          coalesce(col("purchase"), lit(0L)).as("purchase"),
          coalesce(col("signup"), lit(0L)).as("signup"),
          coalesce(col("view"), lit(0L)).as("view"))
        .orderBy(col("day"))),
    "q_corr_subquery" -> ((s, dir) => {
      // correlated scalar subqueries through the engine's SQL surface:
      // orders costing more than 2x their customer's average
      // (avg expressed as decimal-exact sum/count, FP-order-proof)
      Tables.orders(s, dir).createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM v_orders o
        WHERE CAST(o_totalprice AS DECIMAL(18,4)) *
              (SELECT COUNT(*) FROM v_orders o2 WHERE o2.o_custkey = o.o_custkey) >
              2 * (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,4)))
                   FROM v_orders o3 WHERE o3.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    }),
    "q_having" -> ((s, dir) => {
      // big-spender cohort: HAVING over a join aggregate
      Tables.customer(s, dir).createOrReplaceTempView("v_customer")
      Tables.orders(s, dir).createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT c_custkey, c_mktsegment, COUNT(*) AS n_orders,
               CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS DECIMAL(38,2)) AS DOUBLE) AS total_spend
        FROM v_customer JOIN v_orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_mktsegment
        HAVING MAX(o_totalprice) > 400000.0
        ORDER BY c_custkey""")
    }),
    "q_multi_dist" -> ((s, dir) =>
      // several DISTINCT aggregates in one pass — planned as ONE
      // Expand (row replicated per distinct set) + two-level
      // aggregate, not one scan per distinct column
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          countDistinct(col("l_orderkey")).as("n_ord"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("l_returnflag"))),
    "q_rank_funcs" -> ((s, dir) => {
      // the relative-rank window family (percent_rank / cume_dist /
      // nth_value): ratios emitted in floor-to-micro-units so the
      // integer rank arithmetic, not FP formatting, is what's compared
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice"), col("p_partkey"))
      Tables.part(s, dir)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          floor(percent_rank().over(w) * 1e6).cast("long").as("pr_micro"),
          floor(cume_dist().over(w) * 1e6).cast("long").as("cd_micro"),
          nth_value(col("p_partkey"), 2).over(w).as("second_key"))
        .orderBy(col("p_brand"), col("p_retailprice"), col("p_partkey"))
    }),
    "q_window_funcs" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") <= 1000)
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("next_price", lead(col("l_extendedprice"), 1).over(w))
        .withColumn("min_price",
          first(col("l_extendedprice")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("quartile"), col("next_price"), col("min_price"))
        .orderBy(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
    }),
    "q_setops" -> ((s, dir) => {
      def buyers(y: Int) = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")) === y)
        .select(col("o_custkey"))
      val both = buyers(1996).intersect(buyers(1997))
      val only96 = buyers(1996).except(buyers(1997))
      both.withColumn("cohort", lit("both"))
        .unionByName(only96.withColumn("cohort", lit("only_1996")))
        .orderBy(col("cohort"), col("o_custkey"))
    }),
    "q_percentile" -> ((s, dir) =>
      graft.operators.Percentiles.exact(
        Tables.lineitem(s, dir), Seq("l_returnflag"), "l_extendedprice",
        Seq(0.5, 0.9), Seq("p50_price", "p90_price"))
        .orderBy(col("l_returnflag"))),
    "q_approx_quantile" -> ((s, dir) => {
      // sketch certification #2 (the q_approx_distinct pattern): the
      // GK percentile sketch guarantees rank error ≤ 1/accuracy
      // REGARDLESS of partition/merge order, so with accuracy=1000 the
      // estimate must land between the exact p±0.01 quantiles. The
      // gated output is the engine-independent claim: exact quantiles
      // + in-bound flags the oracle pins TRUE.
      val li = Tables.lineitem(s, dir)
      val bounds = graft.operators.Percentiles.exact(
        li, Seq("l_returnflag"), "l_extendedprice",
        Seq(0.49, 0.5, 0.51, 0.94, 0.95, 0.96),
        Seq("lo50", "exact_p50", "hi50", "lo95", "exact_p95", "hi95"))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("a50"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000)).as("a95"))
      bounds.join(broadcast(approx), "l_returnflag")
        .select(col("l_returnflag"), col("exact_p50"), col("exact_p95"),
          (col("a50") >= col("lo50") && col("a50") <= col("hi50")).as("p50_in_bound"),
          (col("a95") >= col("lo95") && col("a95") <= col("hi95")).as("p95_in_bound"))
        .orderBy(col("l_returnflag"))
    }),
    "q_mad" -> ((s, dir) => {
      // robust dispersion: median absolute deviation per group — two
      // exact-quantile passes (sort-based, spillable), the tiny
      // median table broadcast back between them
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val med = graft.operators.Percentiles.exact(
        ev, Seq("event_type"), "value", Seq(0.5), Seq("median"))
      val dev = ev.join(broadcast(med), "event_type")
        .select(col("event_type"), abs(col("value") - col("median")).as("adev"))
      graft.operators.Percentiles.exact(
          dev, Seq("event_type"), "adev", Seq(0.5), Seq("mad"))
        .join(broadcast(med), "event_type")
        .select(col("event_type"), col("median"), col("mad"))
        .orderBy(col("event_type"))
    }),
    "q_ab_test" -> ((s, dir) => {
      // experiment readout: users deterministically split A/B by md5
      // parity (engine-portable, retry-stable), per-event-type cohort
      // means from decimal-exact sums and Welch's t² from those exact
      // moments — every double derives from identical inputs via
      // IEEE-exact ops, so the statistic is bit-reproducible
      val ev = Tables.events(s, dir)
        .withColumn("cohort",
          when(expr("substr(md5(cast(user_id as string)), 1, 1) < '8'"), "A")
            .otherwise("B"))
      ev.groupBy(col("event_type"), col("cohort"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).as("sx"),
          sum((col("value").cast("decimal(18,4)") *
            col("value").cast("decimal(18,4)"))).as("sxx"))
        .groupBy(col("event_type"))
        .agg(
          max(when(col("cohort") === "A", col("n"))).as("n_a"),
          max(when(col("cohort") === "B", col("n"))).as("n_b"),
          money(max(when(col("cohort") === "A", col("sx")))).as("sx_a"),
          money(max(when(col("cohort") === "B", col("sx")))).as("sx_b"),
          // 4dp before the double cast: an 8dp integer form exceeds
          // 2^53 and DuckDB's int128→double cast double-rounds there
          // (the dsum convention, at quadratic scale)
          max(when(col("cohort") === "A", col("sxx"))).cast("decimal(38,4)")
            .cast("double").as("sxx_a"),
          max(when(col("cohort") === "B", col("sxx"))).cast("decimal(38,4)")
            .cast("double").as("sxx_b"))
        .withColumn("mean_a", col("sx_a") / col("n_a"))
        .withColumn("mean_b", col("sx_b") / col("n_b"))
        .withColumn("var_a",
          (col("sxx_a") - col("sx_a") * col("sx_a") / col("n_a")) / (col("n_a") - 1))
        .withColumn("var_b",
          (col("sxx_b") - col("sx_b") * col("sx_b") / col("n_b")) / (col("n_b") - 1))
        .withColumn("t2",
          (col("mean_a") - col("mean_b")) * (col("mean_a") - col("mean_b")) /
            (col("var_a") / col("n_a") + col("var_b") / col("n_b")))
        .select(col("event_type"), col("n_a"), col("n_b"),
          col("mean_a"), col("mean_b"), col("t2"))
        .orderBy(col("event_type"))
    }),
    "q_clip_outliers" -> ((s, dir) => {
      // robust-preprocessing shape: exact per-group p01/p99 (the
      // sort-based scalable quantile, not a buffering percentile agg)
      // → broadcast the tiny threshold table back over the fact →
      // winsorize + clip-count report in one map-side-combined pass
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val thr = graft.operators.Percentiles.exact(
        ev, Seq("event_type"), "value", Seq(0.01, 0.99), Seq("p01", "p99"))
      val clipped = greatest(least(col("value"), col("p99")), col("p01"))
      ev.join(broadcast(thr), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") < col("p01"), 1L).otherwise(0L)).as("n_clip_low"),
          sum(when(col("value") > col("p99"), 1L).otherwise(0L)).as("n_clip_high"),
          min(clipped).as("min_clipped"),
          max(clipped).as("max_clipped"))
        .orderBy(col("event_type"))
    }),
    "q_json" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).cast("long").as("sum_k"),
          count(col("k")).as("n_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),

    // ---- LLM-training-data pipeline surface ----
    "q_text_stats" -> ((s, dir) =>
      TextAnalysis.stats(Tables.documents(s, dir))
        .select(col("doc_id"), col("n_chars"), col("n_tokens"), col("n_bpeish"),
          col("mean_word_len"), col("punct_ratio"))
        .orderBy(col("doc_id"))),
    "q_quality_score" -> ((s, dir) =>
      TextAnalysis.stats(Tables.documents(s, dir))
        .select(col("doc_id"), col("stopword_ratio"), col("quality"))
        .orderBy(col("doc_id"))),
    "q_lang_id" -> ((s, dir) =>
      TextAnalysis.stats(Tables.documents(s, dir))
        .select(col("doc_id"), col("lang_pred"))
        .orderBy(col("doc_id"))),
    "q_corpus_mix" -> ((s, dir) =>
      TextAnalysis.corpusMix(Tables.documents(s, dir))
        .orderBy(col("source"), col("lang"))),
    "q_vocab" -> ((s, dir) =>
      // corpus vocabulary stats: top tokens by frequency (explode +
      // count, the canonical map-side-combined word count)
      Tables.documents(s, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)),
    "q_bpe_train" -> ((s, dir) =>
      // iterated BPE merge training: 3 rounds of corpus-wide top-pair
      // + greedy leftmost sequence rewrite, entirely as windows over
      // the (doc, pos) token table — no driver loop over data
      graft.operators.Bpe.trainMerges(Tables.documents(s, dir), rounds = 3)),
    "q_bpe_encode" -> ((s, dir) => {
      // the tokenizer-application half: merges trained on the train
      // cohort encode the held-out eval cohort — the standard
      // train-tokenizer-once, encode-everything pipeline shape. The
      // oracle replays both chains; a hash match proves the greedy
      // rewrite applies trained (not re-counted) pairs
      import graft.operators.{Bpe, Corpus}
      val docs = Tables.documents(s, dir)
      val train = docs.filter(Corpus.splitLabel(col("doc_id"), 0.8) === "train")
      val eval = docs.filter(Corpus.splitLabel(col("doc_id"), 0.8) === "eval")
      Bpe.applyMerges(eval, Bpe.trainMerges(train, rounds = 3), rounds = 3)
        .orderBy(col("doc_id"), col("pos"))
    }),
    "q_cooccur" -> ((s, dir) =>
      // collocation mining: document co-occurrence counts + integer
      // lift (exp-PMI in micro units) for pairs of the top-50
      // df-vocabulary — vocab broadcasts back, pairs are a bounded
      // slice-explode per doc (no token×token or doc×doc join)
      TextAnalysis.cooccurrence(Tables.documents(s, dir),
        vocabSize = 50, topK = 50)),
    "q_fluency" -> ((s, dir) => {
      // CCNet-style quality signal: every doc scored by the mean
      // reference-frequency of its bigrams, with the train cohort as
      // the trusted reference slice — integer-exact (micro units) so
      // the gate is engine-independent (log-space LM scores are not)
      val docs = Tables.documents(s, dir)
      TextAnalysis.fluencyScore(docs,
        docs.filter(graft.operators.Corpus.splitLabel(col("doc_id"), 0.8) === "train"))
        .orderBy(col("doc_id"))
    }),
    "q_bigrams" -> ((s, dir) =>
      // corpus-wide adjacent-pair frequencies (multiplicity counts) —
      // the merge-frequency step a BPE-style trainer iterates; one
      // explode + one map-side-combined shuffle, top-20 deterministic.
      // bigramPairs (codegen'd slice+zip) not bigrams (lambda HOF):
      // the interpreted transform re-runs per row under the explode
      // guards — measured 13× slower (NOTES_r3.md)
      Tables.documents(s, dir)
        .select(explode(TextAnalysis.bigramPairs(col("text"))).as("p"))
        .select(concat_ws(" ", col("p.a"), col("p.b")).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)),
    "q_approx_distinct" -> ((s, dir) =>
      // HLL++ sketch certification: the raw estimate has no DuckDB
      // counterpart (different sketch), so the GATED output is the
      // engine-independent claim — exact cardinalities plus a flag
      // that the sketch landed within 5× its 2% rsd. The oracle
      // asserts the flag is TRUE, making the error bound
      // driver-verified on every run (raw-estimate properties stay in
      // ApproxSpec; production callers use the sketch alone —
      // the exact aggregate here exists to judge it).
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          (abs(approx_count_distinct(col("user_id"), 0.02) -
            countDistinct(col("user_id"))) <=
            countDistinct(col("user_id")) * 0.1).as("users_in_bound"),
          countDistinct(col("props")).as("exact_props"),
          (abs(approx_count_distinct(col("props"), 0.02) -
            countDistinct(col("props"))) <=
            countDistinct(col("props")) * 0.1).as("props_in_bound"))
        .orderBy(col("event_type"))),
    "q_split" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.operators.Corpus.splitLabel(col("doc_id"), 0.8).as("cohort"))
        .orderBy(col("doc_id"))),
    "q_epoch_shuffle" -> ((s, dir) =>
      // deterministic training-order shuffle: seed-salted hash rank,
      // two-level (shard + per-shard window) so no global sort exists
      graft.operators.Corpus.epochShuffle(Tables.documents(s, dir),
        seed = 7L, nShards = 8)
        .orderBy(col("shard"), col("pos"))),
    "q_winnow" -> ((s, dir) =>
      // winnowing fingerprints (MOSS selection rule, value-set
      // variant): sliding-window min over positional shingle hashes
      LshDedup.winnowFingerprints(Tables.documents(s, dir), n = 3, w = 4)
        .orderBy(col("doc_id"), col("fp"))),
    "q_decontaminate" -> ((s, dir) =>
      // eval-set 5-gram leakage into the train cohort (broadcast eval
      // n-gram set; corpus never shuffles)
      graft.operators.Curation.contaminationReport(Tables.documents(s, dir))
        .orderBy(col("doc_id"))),
    "q_decontaminate_bloom" -> ((s, dir) =>
      // the same report through the bloom-prefilter scale path (exact
      // after the verify join; filter bits built distributed)
      graft.operators.Curation.contaminationReportBloom(Tables.documents(s, dir))
        .orderBy(col("doc_id"))),
    "q_decontaminate_semantic" -> ((s, dir) => {
      // embedding-space contamination: train vectors ≥ 0.35
      // micro-cosine close to any eval vector (vec_id % 10 == 0 as
      // the stand-in eval suite) — catches paraphrased leakage the
      // n-gram screens miss; eval broadcasts, train scans once,
      // integer-micro argmax tie-break
      val emb = Tables.embeddings(s, dir)
      val isEval = pmod(col("vec_id"), lit(10L)) === 0L
      Similarity.semanticContamination(emb.filter(!isEval),
          emb.filter(isEval), thresholdMicro = 350000L)
        .orderBy(col("train_id"))
    }),
    "q_pii_redact" -> ((s, dir) =>
      graft.operators.Curation.piiRedact(Tables.documents(s, dir))
        .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ids"),
          md5(col("redacted")).as("redacted_md5"))
        .orderBy(col("doc_id"))),
    "q_repetition" -> ((s, dir) =>
      graft.operators.Curation.repetitionStats(Tables.documents(s, dir))
        .orderBy(col("doc_id"))),
    "q_sample_stratified" -> ((s, dir) =>
      graft.operators.Curation.stratifiedSampleReport(Tables.documents(s, dir))
        .orderBy(col("source"))),
    "q_sample_topn" -> ((s, dir) =>
      // exactly 40 docs per source by deterministic hash rank, via the
      // bucketed two-level rank (no window sees a whole stratum)
      graft.operators.Curation.stratifiedTopN(Tables.documents(s, dir), n = 40)
        .select(col("source"), col("rk"), col("doc_id"))
        .orderBy(col("source"), col("rk"))),
    "q_quality_filter" -> ((s, dir) =>
      graft.operators.Curation.qualityFilterVerdicts(Tables.documents(s, dir))
        .orderBy(col("doc_id"))),
    "q_corpus_intake" -> ((s, dir) =>
      // the intake funnel (raw → quality → sampled → unique) per
      // (source, lang) — one scan, one hash window, one rollup
      graft.operators.Curation.intakeReport(Tables.documents(s, dir))
        .orderBy(col("source"), col("lang"))),
    "q_ingest_quarantine" -> ((s, dir) =>
      // third-party-format ingest with the PERMISSIVE quarantine
      // contract, end to end on REAL file drops built from the
      // documents table: a zstd-compressed jsonl drop (via the
      // ZstdJniCodec bridge — no native Hadoop zstd in this or many
      // a stock deployment) where every doc_id % 50 == 0 line is
      // garbage, and a gzip csv drop where every doc_id % 71 == 0
      // row carries an unparseable numeric. Clean rows flow on; the
      // quarantine captures the raw text of every bad line. The
      // corruption rule is a pure function of doc_id, so DuckDB
      // reproduces every aggregate from the parquet table alone —
      // the oracle certifies the parse split, not just row counts.
      // The whole roundtrip (drop build, parse, aggregates) lives in
      // Ingest.quarantineRoundtrip, shared with IngestHostileSpec's
      // closed-form gate over newline/quote/non-BMP/NULL text.
      graft.sources.Ingest.quarantineRoundtrip(s,
        Tables.documents(s, dir).select(col("doc_id"), col("source"), col("text")),
        java.nio.file.Files.createTempDirectory("graft_ingest").toString)),
    "q_pipeline_curate" -> ((s, dir) =>
      // the composed end-to-end funnel: quality gate -> exact dedup
      // -> train/eval split -> eval decontamination, per-source stage
      // counts in ONE plan (single corpus scan, one hash window, gram
      // explode only over deduped survivors)
      graft.operators.Curation.curatePipeline(Tables.documents(s, dir))
        .orderBy(col("source"))),
    "q_pipeline_full" -> ((s, dir) =>
      // the WHOLE pipeline composed: curate funnel + capped
      // containment prune + DSIR threshold resample + UniMax mix +
      // token-balanced shards + sequence packing, reported as the
      // 10-row stage funnel (Curation.fullPipeline scaladoc) — the
      // composition the brief's product actually ships, gated as one
      // query so a stage wired to the wrong survivor set (or a lost
      // cache forcing a re-scan) is a correctness diff, not a
      // slowdown. Round 12: gated over the PRODUCTION tier path
      // (fullPipelineStaged — parquet tiers, crash/resumable; fresh
      // tier dir per invocation, resume itself is ReplayGate's axis)
      graft.operators.Curation.fullPipelineStaged(Tables.documents(s, dir),
          java.nio.file.Files.createTempDirectory("graft_tiers").toString)
        .orderBy(col("stage_id"))),
    "q_gopher_rules" -> ((s, dir) =>
      // the Gopher heuristic rule battery (Rae et al. 2021 A.1.1):
      // per-doc rule stats as floor-micro integers + the conjunctive
      // pass verdict compared on the micros — engine-exact, pure
      // projection (scan-speed, no shuffle, no UDF)
      graft.operators.Curation.gopherRules(Tables.documents(s, dir))
        .orderBy(col("doc_id"))),
    "q_token_hist" -> ((s, dir) =>
      graft.operators.Curation.tokenHistogram(Tables.documents(s, dir))
        .orderBy(col("bucket"))),
    "q_line_dedup" -> ((s, dir) =>
      // C4-style segment-level boilerplate removal: global segment
      // document frequency, drop segments in > maxDf docs, reassemble
      graft.operators.Curation.lineDedup(Tables.documents(s, dir),
        segTokens = 4, maxDf = 8)
        .orderBy(col("doc_id"))),
    "q_mix_weights" -> ((s, dir) =>
      // source-mix planner: largest token budget at the target mix
      // with no source upsampled, per-source keep rates in micro units
      graft.operators.Curation.mixWeights(Tables.documents(s, dir))
        .orderBy(col("source"))),
    "q_temperature_mix" -> ((s, dir) =>
      // α=0.5 temperature flattening of the source mix (low-resource
      // upweighting); sqrt is correctly rounded in IEEE-754, so the
      // integer-unit weights hash-match the oracle exactly
      graft.operators.Curation.temperatureMix(Tables.documents(s, dir))
        .orderBy(col("source"))),
    "q_mix_unimax" -> ((s, dir) =>
      // UniMax epoch-capped waterfilling at E=1 over a one-corpus
      // budget: small sources bind at their cap, the largest absorbs
      // the rest — the fairness-motivated alternative to temperature
      // scaling; integer-exact binding decision (multiply, not divide)
      graft.operators.Curation.unimaxMix(Tables.documents(s, dir))
        .orderBy(col("source"))),
    "q_chunk" -> ((s, dir) =>
      graft.operators.Corpus.chunk(Tables.documents(s, dir), chunkSize = 32, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_id"))),
    "q_pack" -> ((s, dir) =>
      graft.operators.Corpus.packSequences(
        graft.operators.Corpus.chunk(Tables.documents(s, dir), chunkSize = 32, overlap = 8),
        seqLen = 256, nBuckets = 8)
        .orderBy(col("bucket"), col("seq_id"))),
    "q_shard_plan" -> ((s, dir) =>
      // token-balanced export sharding: contiguous doc_id ranges with
      // ~total/8 tokens per shard (hash-mod-N balances doc COUNTS,
      // not tokens); distributed prefix sum + 1-row total broadcast
      graft.operators.Corpus.shardPlan(Tables.documents(s, dir), nShards = 8)
        .orderBy(col("doc_id"))),
    "q_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(Tables.documents(s, dir), k = 3)
        .withColumn("tfidf_micro", floor(col("tfidf") * 1e6).cast("long"))
        .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"),
          col("tfidf_micro"))
        .orderBy(col("doc_id"), col("rk"))),
    "q_posting_lookup" -> ((s, dir) => {
      // persisted inverted index: build once at a scratch path, probe
      // with the corpus's top-5 df terms (deterministic ties by
      // term). The store roundtrip — bucket partitioning, DPP probe,
      // term-sorted files — must be value-exact vs the oracle's
      // direct tf computation
      import graft.operators.PostingStore
      val docs = Tables.documents(s, dir)
      val store = scratchStorePath("postings", dir)
      // r16: the posting table is built ONCE and persisted across its
      // two consumers — the store write and the probe derivation each
      // re-ran the tokenize + (doc, term) count pass before (guide §5
      // multi-consumer reuse; released after the lookup's first action)
      val built = PostingStore.build(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      PostingStore.writeBuilt(built, store)
      // probe terms derive from the documents side, not the store (a
      // same-table probe has no selective other side), and carry a
      // real predicate (df > 1): Spark only injects the DPP subquery
      // when the probe side has a Filter — aggregates/limits alone
      // don't count as selective. The pruning is the layout property
      // under test
      val probe = built
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .filter(col("df") > 1)
        .orderBy(col("df").desc, col("term")).limit(5)
        .select(col("term"))
      graft.operators.LshDedup.unpersistAfterFirstUse(
        PostingStore.lookup(s, store, probe)
          .orderBy(col("term"), col("doc_id")), built)
    }),
    "q_bm25" -> ((s, dir) =>
      TextAnalysis.bm25TopK(Tables.documents(s, dir), k = 3)
        .withColumn("bm25_micro", floor(col("bm25") * 1e6).cast("long"))
        .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"),
          col("dl"), col("bm25_micro"))
        .orderBy(col("doc_id"), col("rk"))),
    "q_dup_rate" -> ((s, dir) =>
      // per-source duplication health: doc count vs distinct content
      // hashes (only 16-byte digests shuffle into the distinct
      // aggregate; text never leaves the scan) + integer-exact dup
      // ratio in micro units — the corpus-monitoring counterpart of
      // q_dedup_exact
      Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(Dedup.contentHash(col("text"))).as("n_unique"))
        .withColumn("dup_micro",
          expr("(n_docs - n_unique) * 1000000 div n_docs"))
        .orderBy(col("source"))),
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(Tables.documents(s, dir))
        .orderBy(col("content_hash"))),
    "q_substring_dedup" -> ((s, dir) =>
      // span-level dedup report (Lee et al. 2021 scaled to fixed
      // 8-token grams): corpus-wide duplicated gram hashes mark their
      // covered token positions; only 8-byte hashes shuffle
      Dedup.duplicateSpans(Tables.documents(s, dir), n = 8)
        .orderBy(col("doc_id"))),
    "q_substring_cut" -> ((s, dir) =>
      // the destructive half: keep each duplicated gram's FIRST
      // corpus-wide occurrence, cut the rest, reassemble surviving
      // text — ExactSubstr dedup end-to-end, rebuilt strings gated
      Dedup.cutDuplicateSpans(Tables.documents(s, dir), n = 8)
        .orderBy(col("doc_id"))),
    "q_heavy_hitters" -> ((s, dir) =>
      // Misra–Gries certification (the q_approx_distinct pattern):
      // k=30 sits below the corpus vocabulary, so eviction pressure is
      // constant — the near-uniform token counts are the sketch's
      // adversarial case. Gated claims are exact counts of the
      // guaranteed-frequent set plus the two deterministic theorem
      // flags (membership, undercount ≤ N/(k+1)) the oracle pins TRUE;
      // production callers at scale run the k-bounded sketch alone
      // (no vocabulary-sized shuffle).
      graft.operators.HeavyHitters.certified(
        Tables.documents(s, dir)
          .select(explode(TextAnalysis.tokens(col("text"))).as("token")),
        "token", k = 30)),
    "q_dedup_incremental" -> ((s, dir) => {
      // daily-ingest dedup: the eval cohort arrives as a new batch
      // against the train-cohort corpus; only unseen content survives
      val docs = Tables.documents(s, dir)
      val corpus = docs.filter(
        graft.operators.Corpus.splitLabel(col("doc_id"), 0.8) === "train")
      val batch = docs.filter(
        graft.operators.Corpus.splitLabel(col("doc_id"), 0.8) === "eval")
      Dedup.incrementalExact(corpus, batch)
        .select(col("doc_id"), col("content_hash"), col("n_batch_copies"))
        .orderBy(col("doc_id"))
    }),
    "q_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.functions.poly_fingerprint64(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))),
    "q_dedup_minhash" -> ((s, dir) =>
      LshDedup.minhashCandidates(Tables.documents(s, dir))
        .orderBy(col("doc_a"), col("doc_b"))),
    "q_stream_neardup" -> ((s, dir) => {
      // the SAME LSH candidate semantics through Structured Streaming:
      // stateless banding front + one keyed bucket-state lookup per
      // doc (StreamingLsh scaladoc). No bucket overflows its cap on
      // this corpus, so the streamed pairs (distinct'd, like batch)
      // equal the batch chain — and share its DuckDB oracle.
      import graft.streaming.{CandleStream, StreamingLsh}
      s.catalog.dropTempView("q_stream_neardup_sink")
      CandleStream.runBoundedToMemoryAppend(s,
        StreamingLsh.candidatePairs(Tables.documentsStream(s, dir)).toDF(),
        "q_stream_neardup_sink")
        .distinct()
        .orderBy(col("doc_a"), col("doc_b"))
    }),
    "q_dedup_minhash_incr" -> ((s, dir) => {
      // incremental near-dup maintenance: the train cohort's band
      // table is a persisted artifact (BandStore); the eval cohort
      // arrives as a new batch, is banded ALONE, and probes the store
      // — the corpus is never re-shingled. The oracle is the full
      // minhash recompute restricted to pairs with an eval side:
      // bucket membership is identical either way, so the candidate
      // sets must match exactly.
      val docs = Tables.documents(s, dir)
      val corpus = docs.filter(
        graft.operators.Corpus.splitLabel(col("doc_id"), 0.8) === "train")
      val batch = docs.filter(
        graft.operators.Corpus.splitLabel(col("doc_id"), 0.8) === "eval")
      val store = scratchStorePath("graft-bands", dir)
      graft.operators.BandStore.write(corpus, store)
      graft.operators.BandStore.incrementalCandidates(s, store, batch)
        .orderBy(col("doc_a"), col("doc_b"))
    }),
    "q_minhash_est" -> ((s, dir) =>
      // estimator calibration: signature-agreement Jaccard estimate
      // vs exact shingle Jaccard for every LSH candidate pair
      LshDedup.minhashEstimates(Tables.documents(s, dir))
        .orderBy(col("doc_a"), col("doc_b"))),
    "q_dedup_simhash" -> ((s, dir) =>
      LshDedup.simhashCandidates(Tables.documents(s, dir), maxHamming = 6)
        .orderBy(col("doc_a"), col("doc_b"))),
    "q_dedup_neardup_auto" -> ((s, dir) =>
      // the size-gated near-dup DEFAULT (round 13): the operational
      // rule "simhash under the measured cost envelope, minhash band
      // path above it" as code (LshDedup.nearDupCandidates). At gate
      // SF the corpus sits under the envelope, so the oracle is the
      // all-pairs hamming ground truth; the band branch is
      // spec-certified (LshSpec) and its recall measured at 500k
      // (RECALL_COHORT_r12)
      LshDedup.nearDupCandidates(Tables.documents(s, dir), maxHamming = 6)
        .orderBy(col("doc_a"), col("doc_b"))),
    "q_dedup_simhash_capped" -> ((s, dir) =>
      // the skew-capped sibling (maxBucket drop guard + columnar
      // in-bucket pair combos, no bucket self-join): work bounded by
      // buckets × cap² under any corpus skew; answer equals the exact
      // form whenever no bucket exceeds the cap — certified by the
      // SAME all-pairs oracle
      LshDedup.simhashCandidatesCapped(Tables.documents(s, dir), maxHamming = 6)
        .orderBy(col("doc_a"), col("doc_b"))),
    "q_dedup_capped_recall" -> ((s, dir) =>
      // the composed-pipeline recall gate: exact content dedup FIRST
      // (the order a real pipeline runs), capped simhash over the
      // survivors, pair recall vs the exact miner on the same
      // survivors — the measured answer to "the cap's dropped pairs
      // are exact-dup territory" (round-7 audit: asserted, not gated)
      LshDedup.simhashCappedRecallReport(Tables.documents(s, dir),
        maxHamming = 6)),
    "q_dedup_health" -> ((s, dir) =>
      // per-source skew-cap observability: maxBucket deliberately low
      // here so the guard actually fires at test SF and the oracle
      // certifies non-trivial drop numbers (production keeps the
      // 1000-ish default and alerts on n_slots_dropped > 0)
      LshDedup.dedupHealth(Tables.documents(s, dir), maxBucket = 2)
        .orderBy(col("source"))),
    "q_source_overlap" -> ((s, dir) =>
      // source×source shared-content matrix (distinct 3-gram Jaccard,
      // integer micro units); gram-bucketed join, pair work bounded
      // by |sources|² per gram
      graft.operators.TextAnalysis.sourceOverlap(Tables.documents(s, dir))
        .orderBy(col("source_a"), col("source_b"))),
    "q_ngram_jaccard" -> ((s, dir) =>
      // exact inverted-index set-similarity join (no LSH recall
      // caveat) — the ground-truth path; LSH-pruned mining is graded
      // separately as q_dedup_minhash
      LshDedup.exactJaccardPairs(Tables.documents(s, dir), threshold = 0.2)
        .withColumn("jaccard_micro", floor(col("jaccard") * 1e6).cast("long"))
        .select(col("doc_a"), col("doc_b"), col("jaccard_micro"))
        .orderBy(col("doc_a"), col("doc_b"))),
    "q_containment" -> ((s, dir) =>
      // asymmetric near-containment (quote-in-article dups that
      // symmetric Jaccard + its length filters structurally miss):
      // prefix-probe / full-index exact overlap join
      LshDedup.containmentPairs(Tables.documents(s, dir), threshold = 0.5)
        .withColumn("containment_micro", floor(col("containment") * 1e6).cast("long"))
        .select(col("doc_a"), col("doc_b"), col("containment_micro"))
        .orderBy(col("doc_a"), col("doc_b"))),
    "q_containment_scale" -> ((s, dir) =>
      // the containment-class SCALE path: df-capped prefix-probe
      // banding — per-shingle work ≤ cap², candidate volume bounded
      // by the work budget, no exact quadratic join, no ExactScale
      // guard needed. The cap is corpus-RELATIVE (min(1000, ⌈1%·N⌉,
      // budget cap)): an absolute df threshold that binds at 500
      // docs is vacuous at 50k and vice versa (measured — a flat
      // maxDf=4 gave recall 1.0 at sf0.01 but 0 at sf1). Width n=5,
      // NOT the exact miner's n=3: gram-keyed mining needs an
      // unsaturated key space, and this corpus's 31-word vocabulary
      // realizes 100% of its 29,791 possible 3-grams by sf1 (min df
      // 52; 750 at sf10 — Σdf² = 23.5e9 join rows, nothing rare to
      // key on), while the 5-gram space keeps a df-1 tail at sf10
      // (16.8M of 28.6M realized, Σdf² = 48.8M). Re-keying wider is
      // the standard saturation response (ExactSubstr's 8-gram
      // precedent); the recall gate below uses the SAME width's
      // exact miner as ground truth.
      LshDedup.containmentPairsCapped(Tables.documents(s, dir),
          threshold = 0.5, n = 5, maxDf = 1000L, maxDfPercent = 1)
        .withColumn("containment_micro", floor(col("containment") * 1e6).cast("long"))
        .select(col("doc_a"), col("doc_b"), col("containment_micro"))
        .orderBy(col("doc_a"), col("doc_b"))),
    "q_containment_recall" -> ((s, dir) =>
      // the recall gate wiring q_containment_scale to its exact
      // ground truth (the q_dedup_capped_recall pattern): capped ⊆
      // exact by construction, so the count ratio is pair recall;
      // n_grams_capped certifies the cap actually fired
      LshDedup.containmentCappedRecallReport(Tables.documents(s, dir),
        threshold = 0.5, n = 5, maxDf = 1000L, maxDfPercent = 1)),
    "q_dsir" -> ((s, dir) =>
      // DSIR importance resampling pool: hashed-unigram importance
      // weights vs the src0 target slice, top-100 most target-like
      // raw docs (integer-micro weights — engine-independent)
      graft.operators.Curation.dsirWeights(Tables.documents(s, dir),
          isTarget = col("source") === "src0")
        .orderBy(col("weight_micro").desc, col("doc_id"))
        .limit(100)
        .select(col("doc_id"), col("n_tokens"), col("weight_micro"))),
    "q_dsir_incr" -> ((s, dir) => {
      // incremental DSIR maintenance (DsirStore): the corpus arrives
      // as three batches; each is tokenized ALONE into its compact
      // count table and folded into the store (one append re-driven
      // to exercise the retry-idempotence probe), then the weight
      // pass runs over the store. Must equal the full recompute
      // bit-for-bit — same oracle as q_dsir, verbatim (the
      // q_dedup_cluster_incr precedent).
      val docs = Tables.documents(s, dir)
      val isTarget = col("source") === "src0"
      val batchOf = pmod(col("doc_id"), lit(3L))
      val store = scratchStorePath("graft-dsir", dir)
      graft.operators.DsirStore.write(docs.filter(batchOf === 0L), isTarget, store)
      graft.operators.DsirStore.append(docs.filter(batchOf === 1L), isTarget, store)
      // a foreachBatch RETRY re-delivers a batch: the presence probe
      // must make the re-append a no-op, not a double count
      graft.operators.DsirStore.append(docs.filter(batchOf === 1L), isTarget, store)
      graft.operators.DsirStore.append(docs.filter(batchOf === 2L), isTarget, store)
      graft.operators.DsirStore.weights(s, store)
        .orderBy(col("weight_micro").desc, col("doc_id"))
        .limit(100)
        .select(col("doc_id"), col("n_tokens"), col("weight_micro"))
    }),
    "q_embed_neardup" -> ((s, dir) =>
      Similarity.blockedNearDupPairs(Tables.embeddings(s, dir), threshold = 0.45)
        .withColumn("sim_micro", floor(col("sim") * 1e6).cast("long"))
        .select(col("vec_a"), col("vec_b"), col("sim_micro"))
        .orderBy(col("vec_a"), col("vec_b"))),
    "q_semdedup" -> ((s, dir) =>
      // SemDeDup: semantic dedup without cross-cluster compares —
      // md5-sampled cells (oracle-reproducible), within-cell cosine,
      // drop when an earlier in-cell member exceeds the threshold
      Similarity.semDedup(Tables.embeddings(s, dir), nCells = 16, threshold = 0.35)
        .orderBy(col("vec_id"))),
    "q_knn_brute" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.knnBrute(emb, emb.filter(col("vec_id") < 3), topK = 10)
        .withColumn("sim_micro", floor(col("sim") * 1e6).cast("long"))
        .select(col("query_id"), col("rank"), col("vec_id"), col("sim_micro"))
        .orderBy(col("query_id"), col("rank"))
    }),
    "q_knn_graph" -> ((s, dir) =>
      // every vector's top-5 neighbors (kNN graph) via the triangle-
      // blocked self-join: each unordered pair scored once, no
      // cartesian node, WindowGroupLimit partial top-k
      Similarity.knnGraph(Tables.embeddings(s, dir), k = 5)
        .withColumn("sim_micro", floor(col("sim") * 1e6).cast("long"))
        .select(col("vec_id"), col("rank"), col("neighbor_id"), col("sim_micro"))
        .orderBy(col("vec_id"), col("rank"))),
    "q_kmeans" -> ((s, dir) =>
      // deterministic fixed-point Lloyd's: 2 iterations, k=8, every
      // vector's final cluster — the clustering primitive under
      // SemDeDup-style curation; integer arithmetic end to end, so
      // the oracle replays training exactly
      graft.operators.KMeans.fit(Tables.embeddings(s, dir), k = 8, iters = 2)
        .select(col("vec_id"), col("cluster"))
        .orderBy(col("vec_id"))),
    "q_kmeans_quality" -> ((s, dir) =>
      // per-cluster size + exact fixed-point inertia (the elbow-curve
      // readout) of the same fit
      graft.operators.KMeans.quality(
          graft.operators.KMeans.fit(Tables.embeddings(s, dir), k = 8, iters = 2))
        .orderBy(col("cluster"))),
    "q_semdedup_kmeans" -> ((s, dir) =>
      // paper-faithful SemDeDup: within-cluster prior-cosine sweep
      // over Lloyd-refined (balanced) cells — the md5-cell variant is
      // q_semdedup; cells here come from the same deterministic fit
      // the oracle replays
      graft.operators.KMeans.semDedup(Tables.embeddings(s, dir),
          k = 8, iters = 2, threshold = 0.35)
        .orderBy(col("vec_id"))),
    "q_ann_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.annLsh(emb, emb.filter(col("vec_id") < 3), topK = 10, nBits = 4)
        .withColumn("sim_micro", floor(col("sim") * 1e6).cast("long"))
        .select(col("query_id"), col("rank"), col("vec_id"), col("sim_micro"))
        .orderBy(col("query_id"), col("rank"))
    }),
    "q_ann_int8" -> ((s, dir) => {
      // quantized ANN: int8 coarse scoring (integer-exact, 4x less
      // data in flight) then exact cosine re-rank of the candidates
      val emb = Tables.embeddings(s, dir)
      Similarity.annInt8(emb, emb.filter(col("vec_id") < 3),
        topK = 10, coarseK = 50)
        .withColumn("sim_micro", floor(col("sim") * 1e6).cast("long"))
        .select(col("query_id"), col("rank"), col("vec_id"), col("sim_micro"))
        .orderBy(col("query_id"), col("rank"))
    }),
    "q_ann_binary" -> ((s, dir) => {
      // 1-bit quantized ANN: hamming coarse top-50 over packed sign
      // bits (8 bytes/vector at dim 64 — the cheapest index tier,
      // and the only quantizer with NO training artifact), exact
      // float cosine re-rank to top-10
      val emb = Tables.embeddings(s, dir)
      Similarity.annBinary(emb, emb.filter(col("vec_id") < 3),
        topK = 10, coarseK = 50)
        .withColumn("sim_micro", floor(col("sim") * 1e6).cast("long"))
        .select(col("query_id"), col("rank"), col("vec_id"), col("sim_micro"))
        .orderBy(col("query_id"), col("rank"))
    }),
    "q_ann_binary_asym" -> ((s, dir) => {
      // asymmetric binary ANN: query magnitudes scored against the
      // same 1-bit index (integer-exact dot(micro(q), sign(c)) —
      // native SignDot); recall 0.60 vs 0.51 symmetric at
      // 512k/coarseK=5000 (AnnBench — collision-bounded at dim 64,
      // see Similarity.annBinaryAsym)
      val emb = Tables.embeddings(s, dir)
      Similarity.annBinaryAsym(emb, emb.filter(col("vec_id") < 3),
        topK = 10, coarseK = 50)
        .withColumn("sim_micro", floor(col("sim") * 1e6).cast("long"))
        .select(col("query_id"), col("rank"), col("vec_id"), col("sim_micro"))
        .orderBy(col("query_id"), col("rank"))
    }),
    "q_value_drift" -> ((s, dir) =>
      // scalar feature-drift screen: TV + KS over 32 fixed-width
      // micro-integer buckets of event value, cohorts = first vs
      // second half of the event window (the train/serve time split).
      // Integer-exact end to end like the embedding drift family;
      // state is 32 rows at any corpus size.
      ScalarDrift.valueDrift(Tables.events(s, dir),
        when(col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"), 0)
          .otherwise(1),
        col("value"))),
    "q_value_drift_seg" -> ((s, dir) =>
      // per-segment diagnosis after the global screen trips: which
      // event_type drifted most (top-5 by exact TV, global buckets)
      ScalarDrift.valueDriftBySegment(Tables.events(s, dir),
        col("event_type"),
        when(col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"), 0)
          .otherwise(1),
        col("value"), nBuckets = 32, k = 5)),
    "q_embed_drift" -> ((s, dir) =>
      // distribution-shift screen between two corpus cohorts (here
      // vec_id parity as the stand-in for old/new snapshot): fixed-
      // point centroid cos² + the exact cross-multiplied max per-
      // dimension mean gap — integer arithmetic END TO END, so the
      // oracle lands on identical bits on any DuckDB version
      Similarity.embedDrift(Tables.embeddings(s, dir),
        pmod(col("vec_id"), lit(2)))),
    "q_embed_drift_dims" -> ((s, dir) =>
      // the post-trip diagnosis: WHICH dimensions moved — top-10 by
      // the exact cross-multiplied gap, integer arithmetic end to end
      // like the screen itself
      Similarity.embedDriftDims(Tables.embeddings(s, dir),
        pmod(col("vec_id"), lit(2)), k = 10)
        .orderBy(col("cross_diff").desc, col("pos"))),
    "q_embed_drift_incr" -> ((s, dir) => {
      // incremental drift maintenance (DriftStore): the corpus arrives
      // as three snapshot deltas; each is reduced ALONE to its dims+1
      // sums rows and folded into the store (one append re-driven to
      // exercise the batch-id idempotence probe), then the screen
      // reads the store alone. Additive integer sums ⇒ must equal the
      // full recompute bit-for-bit — same oracle as q_embed_drift,
      // verbatim (the q_dsir_incr precedent).
      val emb = Tables.embeddings(s, dir)
      val cohort = pmod(col("vec_id"), lit(2))
      val batchOf = pmod(col("vec_id"), lit(3L))
      val store = scratchStorePath("graft-drift", dir)
      graft.operators.DriftStore.write(emb.filter(batchOf === 0L), cohort, store, 0L)
      graft.operators.DriftStore.append(emb.filter(batchOf === 1L), cohort, store, 1L)
      // a foreachBatch RETRY re-delivers a batch: the batch-id probe
      // must make the re-append a no-op, not a double count
      graft.operators.DriftStore.append(emb.filter(batchOf === 1L), cohort, store, 1L)
      graft.operators.DriftStore.append(emb.filter(batchOf === 2L), cohort, store, 2L)
      graft.operators.DriftStore.screen(s, store)
    }),
    "q_stream_drift" -> ((s, dir) => {
      // the SAME drift-screen semantics through Structured Streaming:
      // Similarity.driftSums runs unchanged on the embeddings file
      // stream (stateless posexplode_outer + ONE standard streaming
      // aggregation, dims+1 state rows), the complete-mode memory
      // sink holds the per-dimension state, and the integer-exact
      // readout folds it to the one-row screen — bit-identical to
      // batch because the sums are additive integers, so it shares
      // q_embed_drift's DuckDB oracle verbatim. This is the standing
      // monitor shape: at 100 TB the state is dims+1 rows regardless
      // of corpus size, and each micro-batch shuffles only its
      // map-side-combined partials.
      import graft.streaming.CandleStream
      s.catalog.dropTempView("q_stream_drift_sink")
      Similarity.driftReadout(
        CandleStream.runBoundedToMemory(s,
          Similarity.driftSums(Tables.embeddingsStream(s, dir),
            pmod(col("vec_id"), lit(2))),
          "q_stream_drift_sink"))
    }),
    "q_embed_outlier" -> ((s, dir) =>
      // embedding-space outlier screen: bottom-40 by cosine to the
      // corpus centroid DIRECTION (exact long sums of micro-quantized
      // components — order-independent, so engine-portable)
      Similarity.embedOutliers(Tables.embeddings(s, dir), k = 40)
        .withColumn("sim_micro", floor(col("sim") * 1e6).cast("long"))
        .select(col("rank"), col("vec_id"), col("label"), col("sim_micro"))
        .orderBy(col("rank"))),
    "q_ann_pq" -> ((s, dir) => {
      // product-quantization ANN: vectors compress to nSub small
      // codes (here 64 float dims -> 4 codes = 32x), coarse ranking
      // reads only the code table via an integer ADC lookup-table
      // sum, exact cosine re-ranks the candidates. Integer coarse
      // scores + md5-deterministic codebook make the whole chain
      // engine-portable; the oracle replicates it 1:1
      val emb = Tables.embeddings(s, dir)
      Similarity.annPq(emb, emb.filter(col("vec_id") < 3),
        topK = 10, coarseK = 50)
        .withColumn("sim_micro", floor(col("sim") * 1e6).cast("long"))
        .select(col("query_id"), col("rank"), col("vec_id"), col("sim_micro"))
        .orderBy(col("query_id"), col("rank"))
    }),
    "q_ann_ivfpq" -> ((s, dir) => {
      // IVF + PQ combined (the FAISS IVFADC layout): coarse cell
      // pruning to nProbe of nCells cells, integer ADC scoring over
      // ONLY the probed cells' code rows, exact cosine re-rank of the
      // coarse top-coarseK. Every stage reuses a gated piece (IVF
      // argmax assignment, md5-deterministic PQ codebook, ADC LUT),
      // so the oracle composes the two existing replays 1:1
      val emb = Tables.embeddings(s, dir)
      Similarity.annIvfPq(emb, emb.filter(col("vec_id") < 3),
        topK = 10, coarseK = 50)
        .withColumn("sim_micro", floor(col("sim") * 1e6).cast("long"))
        .select(col("query_id"), col("rank"), col("vec_id"), col("sim_micro"))
        .orderBy(col("query_id"), col("rank"))
    }),
    "q_dedup_cluster" -> ((s, dir) =>
      // edges from the exact join so the oracle (recursive-CTE CC over
      // the same exact edge set) is deterministic; CC itself is the
      // operator under test
      Dedup.connectedComponents(
        LshDedup.exactJaccardPairs(Tables.documents(s, dir), threshold = 0.8)
          .select(col("doc_a"), col("doc_b")))
        .orderBy(col("doc_id"))),
    "q_dedup_cluster_incr" -> ((s, dir) => {
      // incremental cluster maintenance: the train cohort's cluster
      // ASSIGNMENT (fixpoint star edges) replaces its original pair
      // set; the eval cohort's arriving pairs merge into it. Must
      // equal the full-corpus recompute exactly — same oracle as
      // q_dedup_cluster. (Pair mining here is the test harness; its
      // incremental form is BandStore's q_dedup_minhash_incr.)
      // one pair-mining pass, split by cohort (mining both sides
      // separately would double the inverted-index join; the operator
      // under test is the assignment merge, not the mining)
      val evalSide = graft.operators.Corpus.splitLabel(col("doc_a"), 0.8) === "eval" ||
        graft.operators.Corpus.splitLabel(col("doc_b"), 0.8) === "eval"
      val allPairs = LshDedup.exactJaccardPairs(
        Tables.documents(s, dir), threshold = 0.8)
        .select(col("doc_a"), col("doc_b"))
        .persist()
      val assignments = Dedup.connectedComponents(allPairs.filter(!evalSide))
      val out = Dedup.incrementalComponents(assignments, allPairs.filter(evalSide))
        .orderBy(col("doc_id"))
      allPairs.unpersist()
      out
    }),
    "q_dedup_corpus" -> ((s, dir) =>
      // the whole dedup pipeline end-to-end: exact content dedup →
      // exact near-dup pairs → connected components → one
      // representative per cluster; output = the surviving corpus
      Dedup.dedupCorpusExact(Tables.documents(s, dir), jaccardThreshold = 0.8)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))),
    "q_ann_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfSearch(
        Similarity.ivfIndex(emb, nCells = 16),
        Similarity.ivfCentroids(emb, nCells = 16),
        emb.filter(col("vec_id") < 3), topK = 10, nProbe = 4)
        .withColumn("sim_micro", floor(col("sim") * 1e6).cast("long"))
        .select(col("query_id"), col("rank"), col("vec_id"), col("sim_micro"))
        .orderBy(col("query_id"), col("rank"))
    }),
    "q_ann_ivf_store" -> ((s, dir) => {
      // the production IVF shape: build/persist the cell-partitioned
      // index once, probe from the artifact (dynamic partition
      // pruning skips unprobed cells at the FILE level). Same oracle
      // as q_ann_ivf — the store roundtrip must be value-exact.
      val emb = Tables.embeddings(s, dir)
      val store = scratchStorePath("graft-ivf", dir)
      graft.operators.IvfStore.write(emb, store, nCells = 16)
      graft.operators.IvfStore.search(s, store,
        emb.filter(col("vec_id") < 3), topK = 10, nProbe = 4)
        .withColumn("sim_micro", floor(col("sim") * 1e6).cast("long"))
        .select(col("query_id"), col("rank"), col("vec_id"), col("sim_micro"))
        .orderBy(col("query_id"), col("rank"))
    }),
    "q_media_meta" -> ((s, dir) =>
      // REAL header decode: packMediaImages synthesizes genuine
      // PNG/JPEG/GIF header bytes (deterministic dimensions), and
      // decodeFeatures PARSES mime/width/height back out of the
      // payload — the oracle recomputes the synthesis arithmetic, so
      // a hash match proves the byte-level parse, not echoed metadata
      Media.decodeFeatures(Media.packMediaImages(Tables.documents(s, dir)))
        .select(col("doc_id"), col("mime"), col("width"), col("height"),
          col("n_bytes"), col("mean_byte"))
        .orderBy(col("doc_id"))),
    "q_media_dedup" -> ((s, dir) =>
      // byte-exact payload dedup over the BINARY column (the
      // content-addressable-storage primitive for blob lakes): only
      // 16-byte digests shuffle, the blobs never leave the scan
      Media.packMedia(Tables.documents(s, dir))
        .select(md5(col("payload")).as("payload_md5"), col("doc_id"),
          length(col("payload")).as("n_bytes"))
        .groupBy(col("payload_md5"))
        .agg(min(col("doc_id")).as("keep_doc_id"),
          count(lit(1)).as("n_copies"),
          min(col("n_bytes")).as("n_bytes"))
        .orderBy(col("payload_md5"))),
    "q_media_frames" -> ((s, dir) =>
      // frame sampling shape check: every stride-th fixed-size payload
      // chunk with its byte length (the partition-parallel frame-
      // extraction pattern; oracle recomputes offsets arithmetically)
      Media.sampleFrames(Media.packMedia(Tables.documents(s, dir)))
        .select(col("doc_id"), col("frame_idx"),
          octet_length(col("frame")).as("frame_bytes"))
        .orderBy(col("doc_id"), col("frame_idx"))),
    "q_media_av" -> ((s, dir) =>
      // REAL container decode: packMediaAv synthesizes genuine
      // WAV/RIFF and MP4/ISO-BMFF byte layouts (deterministic stream
      // parameters), and decodeAvFeatures PARSES sample-rate/channels/
      // dims/duration/track-count back out of the chunk & box walks —
      // the oracle recomputes the synthesis arithmetic, so a hash
      // match proves the byte-level parse, not echoed metadata
      Media.decodeAvFeatures(Media.packMediaAv(Tables.documents(s, dir)))
        .select(col("doc_id"), col("mime"), col("sample_rate"),
          col("channels"), col("width"), col("height"),
          col("duration_ms"), col("n_tracks"), col("n_bytes"))
        .orderBy(col("doc_id"))),
    "q_media_pixels" -> ((s, dir) =>
      // REAL pixel decode, pure JVM: packMediaPixels synthesizes
      // complete valid PNGs (zlib-deflated scanlines cycling all five
      // PNG filter types, per-chunk CRC32, multi-IDAT) and
      // decodePixels INFLATES and UNFILTERS them back to samples —
      // the oracle recomputes the pixel-value arithmetic in closed
      // form, so a hash match proves the decode, not echoed metadata
      Media.decodePixels(Media.packMediaPixels(Tables.documents(s, dir)))
        .select(col("doc_id"), col("mime"), col("width"), col("height"),
          col("n_px"), col("mean_px"), col("min_px"), col("max_px"))
        .orderBy(col("doc_id"))),
    "q_media_gif" -> ((s, dir) =>
      // REAL LZW decode, pure JVM: packMediaGif synthesizes complete
      // GIF89a streams (variable-width LSB-first LZW codes with
      // width growth and clear-code resets, 256-entry palette,
      // extension blocks) and decodeGifPixels unpacks them back to
      // RGB samples — the diagonal-gradient pixel rule gives the
      // oracle closed-form stats, so a hash match proves the LZW
      // unpack + palette resolve, not echoed metadata
      Media.decodeGifPixels(Media.packMediaGif(Tables.documents(s, dir)))
        .select(col("doc_id"), col("mime"), col("width"), col("height"),
          col("n_px"), col("mean_px"), col("min_px"), col("max_px"))
        .orderBy(col("doc_id"))),
    "q_media_audio" -> ((s, dir) =>
      // REAL sample decode: packMediaPcm writes genuine 16-bit LE PCM
      // WAVs and decodePcmFeatures walks the RIFF chunks and decodes
      // the waveform back out — integer sample sums have closed
      // forms, so the oracle recomputes DC/RMS/peak arithmetically
      // and a hash match proves the byte-level sample decode
      Media.decodePcmFeatures(Media.packMediaPcm(Tables.documents(s, dir)))
        .select(col("doc_id"), col("mime"), col("sample_rate"),
          col("channels"), col("n_samples"), col("mean_amp"),
          col("rms_amp"), col("peak_amp"))
        .orderBy(col("doc_id"))),
  )

  /** DuckDB replica of [[graft.operators.Bpe.trainMerges]]: the same
    * `rounds` merge rounds unrolled as CTEs — identical window chain
    * (adjacency lead, match islands via pos − running-match-count,
    * odd-parity greedy rank, drop-after-merge, row_number relabel).
    */
  private def bpeOracleSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                 x -> len(x) > 0) AS tk
        |  FROM documents
        |), t0 AS (
        |  SELECT doc_id, CAST(s['pos'] AS BIGINT) AS pos,
        |         CAST(s['token'] AS VARCHAR) AS token
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(tk)),
        |          i -> struct_pack(pos := i - 1, token := tk[i]))) AS s
        |        FROM tok)
        |)""".stripMargin)
    for (r <- 0 until rounds) {
      sb.append(s""",
        |p$r AS (
        |  SELECT doc_id, pos, token,
        |    lead(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS next
        |  FROM t$r
        |), top$r AS (
        |  SELECT token AS pair_a, next AS pair_b, count(*) AS pair_n
        |  FROM p$r WHERE next IS NOT NULL
        |  GROUP BY 1, 2 ORDER BY pair_n DESC, pair_a, pair_b LIMIT 1
        |), dr$r AS (
        |  SELECT *,
        |    coalesce(lag(do_merge, 1) OVER (PARTITION BY doc_id ORDER BY pos),
        |             FALSE) AS drop_row
        |  FROM (
        |    SELECT *, (is_match AND irk % 2 = 1) AS do_merge FROM (
        |      SELECT *, CASE WHEN is_match THEN row_number()
        |          OVER (PARTITION BY doc_id, island ORDER BY pos) END AS irk
        |      FROM (
        |        SELECT *, CASE WHEN is_match THEN pos - mrn END AS island FROM (
        |          SELECT *, sum(CASE WHEN is_match THEN 1 ELSE 0 END)
        |              OVER (PARTITION BY doc_id ORDER BY pos
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mrn
        |          FROM (
        |            SELECT p.doc_id, p.pos, p.token, p.next, t.pair_a, t.pair_b,
        |              (p.token = t.pair_a AND p.next = t.pair_b) AS is_match
        |            FROM p$r p CROSS JOIN top$r t
        |          )
        |        )
        |      )
        |    )
        |  )
        |), t${r + 1} AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS pos,
        |    CASE WHEN do_merge THEN pair_a || '+' || pair_b ELSE token END AS token
        |  FROM dr$r WHERE NOT drop_row
        |)""".stripMargin)
    }
    sb.append("\n" + (0 until rounds).map(r =>
        s"SELECT ${r + 1} AS round, pair_a, pair_b, pair_n FROM top$r")
      .mkString("", "\nUNION ALL\n", "\nORDER BY round"))
    sb.toString
  }

  /** DuckDB replica of train-on-train + [[graft.operators.Bpe
    * .applyMerges]]-on-eval: the training chain is bpeOracleSql's,
    * restricted to the md5 < 'cccd' cohort; each eval round rewrites
    * with that round's TRAINED pair (cross join top$r) using the
    * identical island/odd-parity/relabel SQL.
    */
  private def bpeEncodeOracleSql(rounds: Int): String = {
    // the shared greedy-rewrite block: annotate `src` (an adjacency
    // table) with `pairSrc`'s 1-row pair, drop merged-into rows,
    // relabel -> `out`
    def rewrite(src: String, pairSrc: String, out: String): String =
      s""",
        |${out}_dr AS (
        |  SELECT *,
        |    coalesce(lag(do_merge, 1) OVER (PARTITION BY doc_id ORDER BY pos),
        |             FALSE) AS drop_row
        |  FROM (
        |    SELECT *, (is_match AND irk % 2 = 1) AS do_merge FROM (
        |      SELECT *, CASE WHEN is_match THEN row_number()
        |          OVER (PARTITION BY doc_id, island ORDER BY pos) END AS irk
        |      FROM (
        |        SELECT *, CASE WHEN is_match THEN pos - mrn END AS island FROM (
        |          SELECT *, sum(CASE WHEN is_match THEN 1 ELSE 0 END)
        |              OVER (PARTITION BY doc_id ORDER BY pos
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mrn
        |          FROM (
        |            SELECT p.doc_id, p.pos, p.token, p.next, t.pair_a, t.pair_b,
        |              (p.token = t.pair_a AND p.next = t.pair_b) AS is_match
        |            FROM $src p CROSS JOIN $pairSrc t
        |          )
        |        )
        |      )
        |    )
        |  )
        |), $out AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS pos,
        |    CASE WHEN do_merge THEN pair_a || '+' || pair_b ELSE token END AS token
        |  FROM ${out}_dr WHERE NOT drop_row
        |)""".stripMargin
    val sb = new StringBuilder
    sb.append(
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                 x -> len(x) > 0) AS tk
        |  FROM documents
        |), t0x AS (
        |  SELECT doc_id, CAST(s['pos'] AS BIGINT) AS pos,
        |         CAST(s['token'] AS VARCHAR) AS token,
        |         md5(CAST(doc_id AS VARCHAR)) < 'cccd' AS is_train
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(tk)),
        |          i -> struct_pack(pos := i - 1, token := tk[i]))) AS s
        |        FROM tok)
        |), t0 AS (SELECT doc_id, pos, token FROM t0x WHERE is_train
        |), e0 AS (SELECT doc_id, pos, token FROM t0x WHERE NOT is_train
        |)""".stripMargin)
    for (r <- 0 until rounds) {
      sb.append(s""",
        |p$r AS (
        |  SELECT doc_id, pos, token,
        |    lead(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS next
        |  FROM t$r
        |), top$r AS (
        |  SELECT token AS pair_a, next AS pair_b, count(*) AS pair_n
        |  FROM p$r WHERE next IS NOT NULL
        |  GROUP BY 1, 2 ORDER BY pair_n DESC, pair_a, pair_b LIMIT 1
        |), ep$r AS (
        |  SELECT doc_id, pos, token,
        |    lead(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS next
        |  FROM e$r
        |)""".stripMargin)
      sb.append(rewrite(s"p$r", s"top$r", s"t${r + 1}"))
      sb.append(rewrite(s"ep$r", s"top$r", s"e${r + 1}"))
    }
    sb.append(s"""
      |SELECT doc_id, CAST(pos AS INTEGER) AS pos, token
      |FROM e$rounds ORDER BY doc_id, pos""".stripMargin)
    sb.toString
  }

  /** Shared CTE chain for the k-means oracles — replays
    * [[graft.operators.KMeans]] training bit-for-bit in DuckDB:
    * floor(x·2^20) fixed point (float→double exact, ·2^20 shifts the
    * exponent only), exact integer squared-L2, truncating integer
    * division for centroid updates (DuckDB `//` and Spark `div` both
    * truncate toward zero), md5-ordered seeds, ties to lowest cluster
    * id. k=8, 2 Lloyd iterations, then a final assignment.
    */
  private val kmeansCte: String =
    """WITH q AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS qv
      |  FROM embeddings
      |), c0 AS (
      |  SELECT vec_id AS cluster, qv AS cent FROM q
      |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
      |), a1 AS (
      |  SELECT vec_id, qv, cluster FROM (
      |    SELECT q.vec_id, q.qv, c.cluster,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        list_sum(list_transform(range(1, len(q.qv)+1),
      |          i -> (q.qv[i]-c.cent[i])*(q.qv[i]-c.cent[i]))), c.cluster) AS rn
      |    FROM q, c0 c) WHERE rn = 1
      |), c1 AS (
      |  SELECT cluster, list(s ORDER BY i) AS cent FROM (
      |    SELECT cluster, i, CAST(sum(v) // count(*) AS BIGINT) AS s
      |    FROM (SELECT cluster, unnest(qv) AS v,
      |                 unnest(range(1, len(qv)+1)) AS i FROM a1)
      |    GROUP BY 1, 2)
      |  GROUP BY cluster
      |), a2 AS (
      |  SELECT vec_id, qv, cluster FROM (
      |    SELECT q.vec_id, q.qv, c.cluster,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        list_sum(list_transform(range(1, len(q.qv)+1),
      |          i -> (q.qv[i]-c.cent[i])*(q.qv[i]-c.cent[i]))), c.cluster) AS rn
      |    FROM q, c1 c) WHERE rn = 1
      |), c2 AS (
      |  SELECT cluster, list(s ORDER BY i) AS cent FROM (
      |    SELECT cluster, i, CAST(sum(v) // count(*) AS BIGINT) AS s
      |    FROM (SELECT cluster, unnest(qv) AS v,
      |                 unnest(range(1, len(qv)+1)) AS i FROM a2)
      |    GROUP BY 1, 2)
      |  GROUP BY cluster
      |), af AS (
      |  SELECT vec_id, cluster, dist FROM (
      |    SELECT q.vec_id, c.cluster,
      |      list_sum(list_transform(range(1, len(q.qv)+1),
      |        i -> (q.qv[i]-c.cent[i])*(q.qv[i]-c.cent[i]))) AS dist,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        list_sum(list_transform(range(1, len(q.qv)+1),
      |          i -> (q.qv[i]-c.cent[i])*(q.qv[i]-c.cent[i]))), c.cluster) AS rn
      |    FROM q, c2 c) WHERE rn = 1
      |)""".stripMargin

  /** The quarantine content fingerprint replica (Σ 60-bit md5
    * prefixes mod 2⁶¹, exact in HUGEINT — Ingest.recordFingerprint),
    * with the hex→int parse written as a Horner fold whose digit
    * lookup is a literal CASE table — CASE/substr/md5/arithmetic are
    * the only constructs, every one already proven on the driver's
    * checker by long-green oracles. A `('0x'||hex)::BIGINT` cast (or
    * even strpos) parses on the LOCAL DuckDB but has no driver
    * precedent, and the whole point of this column is to be readable
    * on ANY checker version. The md5 re-evaluates per digit —
    * irrelevant at quarantine row counts.
    */
  private def fpSql(recExpr: String): String = {
    val digit = "0123456789abcdef".zipWithIndex
      .map { case (c, v) => s"WHEN '$c' THEN $v" }.mkString(" ")
    val horner = (1 to 15).foldLeft("CAST(0 AS BIGINT)") { (acc, i) =>
      s"($acc * 16 + (CASE substr(md5($recExpr), $i, 1) $digit END))"
    }
    s"coalesce(CAST(sum(CAST($horner AS HUGEINT))" +
      " % 2305843009213693952 AS BIGINT), 0)"
  }

  /** q_embed_drift's integer-exact replica — shared verbatim by
    * q_stream_drift (the streamed state is additive integer sums,
    * so the completed monitor equals the batch screen bit-for-bit).
    */
  private val driftSql: String =
    """WITH e AS (
        |  SELECT CAST(((vec_id % 2) + 2) % 2 AS INTEGER) AS cohort,
        |         embedding::DOUBLE[] AS emb
        |  FROM embeddings
        |), n AS (
        |  SELECT
        |    coalesce(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END), 0) AS n_a,
        |    coalesce(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END), 0) AS n_b
        |  FROM e
        |), d AS (
        |  SELECT i,
        |    sum(CASE WHEN cohort = 0 THEN
        |      CASE WHEN emb[i] IS NULL OR isnan(emb[i]) THEN 0
        |           ELSE CAST(floor(emb[i] * 1000000) AS BIGINT) END
        |      ELSE 0 END) AS s_a,
        |    sum(CASE WHEN cohort = 1 THEN
        |      CASE WHEN emb[i] IS NULL OR isnan(emb[i]) THEN 0
        |           ELSE CAST(floor(emb[i] * 1000000) AS BIGINT) END
        |      ELSE 0 END) AS s_b
        |  FROM e, (SELECT unnest(generate_series(1,
        |    (SELECT max(len(emb)) FROM e))) AS i) ix
        |  WHERE i <= len(emb)
        |  GROUP BY i
        |), t AS (
        |  SELECT i, s_a, s_b,
        |    (s_a - ((s_a % p) + p) % p) // p AS ta,
        |    (s_b - ((s_b % p) + p) % p) // p AS tb
        |  FROM d, (SELECT coalesce(max(greatest(abs(s_a), abs(s_b))), 0)
        |             // 8192 + 1 AS p FROM d) pp
        |), q AS (
        |  SELECT
        |    coalesce(sum(ta * tb), 0) AS dot,
        |    coalesce(sum(ta * ta), 0) AS naq,
        |    coalesce(sum(tb * tb), 0) AS nbq,
        |    coalesce(max(abs(CAST(s_a AS HUGEINT) * (SELECT n_b FROM n)
        |      - CAST(s_b AS HUGEINT) * (SELECT n_a FROM n))), 0) AS mcd
        |  FROM t
        |)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CASE WHEN naq = 0 OR nbq = 0 THEN NULL
        |       ELSE (CASE WHEN dot < 0 THEN -1 ELSE 1 END) *
        |         CAST((CAST(dot AS HUGEINT) * CAST(dot AS HUGEINT)
        |               * CAST(1000000000000 AS HUGEINT))
        |              // (CAST(naq AS HUGEINT) * CAST(nbq AS HUGEINT))
        |              AS BIGINT)
        |  END AS centroid_cos2_e12,
        |  CAST(mcd AS BIGINT) AS max_cross_diff
        |FROM q, n""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_bpe_train" -> bpeOracleSql(3),
    "q_bpe_encode" -> bpeEncodeOracleSql(3),
    "q_candle_minute" -> (txnCte + minuteCte + "\n" +
      candleSelect("minute_c", "MINUTE", "ws + INTERVAL 1 minute")),
    "q_stream_candles" -> (txnCte + minuteCte + "\n" +
      candleSelect("minute_c", "MINUTE", "ws + INTERVAL 1 minute")),
    "q_candle_hour" -> rollupSql(CandleTimeFrame.Hour),
    "q_candle_day" -> rollupSql(CandleTimeFrame.Day),
    "q_candle_month" -> rollupSql(CandleTimeFrame.Month),
    "q_candle_multi_tf" -> (txnCte + minuteCte +
      rollupCte("hour").replace("roll_c", "hour_c") +
      rollupCte("day").replace("roll_c", "day_c") +
      rollupCte("month").replace("roll_c", "month_c") +
      """, uni AS (
        |  SELECT symbol, 'MINUTE' AS timeframe, ws, ws + INTERVAL 1 minute AS we,
        |         open, high, low, close, volume, n_txn, strftime(ws, '%Y%m%d%H%M') AS fmt FROM minute_c
        |  UNION ALL
        |  SELECT symbol, 'HOUR', ws, ws + INTERVAL 1 hour, open, high, low, close,
        |         volume, n_txn, strftime(ws, '%Y%m%d%H') FROM hour_c
        |  UNION ALL
        |  SELECT symbol, 'DAY', ws, ws + INTERVAL 1 day, open, high, low, close,
        |         volume, n_txn, strftime(ws, '%Y%m%d') FROM day_c
        |  UNION ALL
        |  SELECT symbol, 'MONTH', ws, ws + INTERVAL 1 month, open, high, low, close,
        |         volume, n_txn, strftime(ws, '%Y%m') FROM month_c
        |)
        |SELECT symbol, timeframe,
        |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(we, '%Y-%m-%d %H:%M:%S') AS window_end,
        |  open, high, low, close, volume, n_txn,
        |  'candle:' || symbol || ':' || timeframe || ':' || fmt AS candle_key
        |FROM uni ORDER BY timeframe, symbol, window_start""".stripMargin),
    "q_candle_range" -> (txnCte + minuteCte + "\n" +
      """SELECT symbol, 'MINUTE' AS timeframe,
        |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(ws + INTERVAL 1 minute, '%Y-%m-%d %H:%M:%S') AS window_end,
        |  open, high, low, close, volume, n_txn
        |FROM minute_c
        |WHERE symbol = 'click' AND ws >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ws < TIMESTAMP '2024-01-10 00:00:00'
        |ORDER BY timeframe, symbol, window_start""".stripMargin),
    "q_candle_recent" -> (txnCte + minuteCte + "\n" +
      """, ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY ws DESC) AS rn
        |  FROM minute_c
        |)
        |SELECT symbol, 'MINUTE' AS timeframe,
        |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(ws + INTERVAL 1 minute, '%Y-%m-%d %H:%M:%S') AS window_end,
        |  open, high, low, close, volume, n_txn
        |FROM ranked WHERE rn <= 5
        |ORDER BY timeframe, symbol, window_start""".stripMargin),
    "q_candle_point" -> (txnCte + minuteCte + rollupCte("day") + "\n" +
      """SELECT symbol, 'DAY' AS timeframe,
        |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(ws + INTERVAL 1 day, '%Y-%m-%d %H:%M:%S') AS window_end,
        |  open, high, low, close, volume, n_txn
        |FROM roll_c
        |WHERE symbol = 'view' AND strftime(ws, '%Y%m%d') = '20240115'
        |ORDER BY timeframe, symbol, window_start""".stripMargin),
    // store-backed variants must equal the direct computation — same
    // oracles as their q_candle_* counterparts by construction
    "q_store_recent" -> (txnCte + minuteCte + "\n" +
      """, ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY ws DESC) AS rn
        |  FROM minute_c
        |)
        |SELECT symbol, 'MINUTE' AS timeframe,
        |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(ws + INTERVAL 1 minute, '%Y-%m-%d %H:%M:%S') AS window_end,
        |  open, high, low, close, volume, n_txn
        |FROM ranked WHERE rn <= 5
        |ORDER BY timeframe, symbol, window_start""".stripMargin),
    "q_store_point" -> (txnCte + minuteCte + rollupCte("day") + "\n" +
      """SELECT symbol, 'DAY' AS timeframe,
        |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(ws + INTERVAL 1 day, '%Y-%m-%d %H:%M:%S') AS window_end,
        |  open, high, low, close, volume, n_txn
        |FROM roll_c
        |WHERE symbol = 'view' AND strftime(ws, '%Y%m%d') = '20240115'
        |ORDER BY timeframe, symbol, window_start""".stripMargin),
    "q_symbols" -> (txnCte + "\n" +
      "SELECT DISTINCT symbol FROM txn ORDER BY symbol"),
    "q_candle_keys" -> (txnCte + minuteCte +
      rollupCte("hour").replace("roll_c", "hour_c") +
      rollupCte("day").replace("roll_c", "day_c") +
      rollupCte("month").replace("roll_c", "month_c") +
      """, uni AS (
        |  SELECT symbol, 'MINUTE' AS timeframe, strftime(ws, '%Y%m%d%H%M') AS fmt FROM minute_c
        |  UNION ALL SELECT symbol, 'HOUR', strftime(ws, '%Y%m%d%H') FROM hour_c
        |  UNION ALL SELECT symbol, 'DAY', strftime(ws, '%Y%m%d') FROM day_c
        |  UNION ALL SELECT symbol, 'MONTH', strftime(ws, '%Y%m') FROM month_c
        |)
        |SELECT 'candle:' || symbol || ':' || timeframe || ':' || fmt AS key
        |FROM uni WHERE symbol = 'view' ORDER BY key""".stripMargin),
    "q_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2)
        |      AS DECIMAL(38,2)) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
        |  o_totalprice, total_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE total_qty > 150.0
        |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_range_window" -> (txnCte + minuteCte + rollupCte("day") + "\n" +
      """SELECT symbol, strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  volume,
        |  CAST(sum(volume) OVER w AS BIGINT) AS vol_3d,
        |  CAST(sum(n_txn) OVER w AS BIGINT) AS txn_3d
        |FROM roll_c
        |WINDOW w AS (PARTITION BY symbol ORDER BY ws
        |             RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY symbol, window_start""".stripMargin),
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       CAST(CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2)
        |         AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), (l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_exists_agg" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2)
        |    AS DECIMAL(38,2)) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                     AND TIMESTAMP '1997-12-31 00:00:00'
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q_supplier_cnt" ->
      """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND NOT EXISTS (SELECT 1 FROM supplier
        |                  WHERE s_acctbal < 0 AND s_suppkey = l_suppkey)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin,
    "q_value_share" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |        CAST(l_quantity AS DECIMAL(18,4))) AS value
        |  FROM lineitem GROUP BY l_partkey
        |)
        |SELECT l_partkey, CAST(CAST(value AS DECIMAL(38,2)) AS DOUBLE) AS part_value
        |FROM pv
        |WHERE CAST(value AS DOUBLE) * 2 * (SELECT COUNT(*) FROM pv) >
        |      CAST((SELECT SUM(value) FROM pv) AS DOUBLE) * 3
        |ORDER BY part_value DESC, l_partkey""".stripMargin,
    "q_concurrency" ->
      """WITH ev AS (
        |  SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL THEN 1
        |         WHEN epoch_us(ts) // 1000000 - epoch_us(lag(ts) OVER w) // 1000000 > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sess AS (
        |  SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged
        |), iv AS (
        |  SELECT user_id, session_seq, min(ts) AS s, max(ts) AS e
        |  FROM sess GROUP BY 1, 2
        |), deltas AS (
        |  SELECT s AS t, 1 AS d FROM iv UNION ALL SELECT e, -1 FROM iv
        |), byday AS (
        |  SELECT t, d, CAST(t AS DATE) AS day FROM deltas
        |), daily AS (
        |  SELECT day, sum(d) AS dd FROM byday GROUP BY 1
        |), carry AS (
        |  SELECT day, coalesce(sum(dd) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
        |  FROM daily
        |), run AS (
        |  SELECT b.day,
        |    sum(d) OVER (PARTITION BY b.day ORDER BY t, d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + c AS r
        |  FROM byday b JOIN carry USING (day)
        |)
        |SELECT CAST(day AS VARCHAR) AS day, CAST(max(r) AS BIGINT) AS peak_concurrency
        |FROM run GROUP BY 1 ORDER BY day""".stripMargin,
    "q_funnel" ->
      """WITH st AS (
        |  SELECT user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts
        |            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1
        |  FROM events
        |), st2 AS (
        |  SELECT *, CASE WHEN event_type = 'click' AND ts > cum1 THEN ts END AS s2
        |  FROM st
        |), st3 AS (
        |  SELECT *, min(s2) OVER (PARTITION BY user_id ORDER BY ts
        |            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
        |  FROM st2
        |), st4 AS (
        |  SELECT *, CASE WHEN event_type = 'purchase' AND ts > cum2 THEN ts END AS s3
        |  FROM st3
        |), u AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS tv,
        |    min(s2) AS tc, min(s3) AS tp
        |  FROM st4 GROUP BY user_id
        |)
        |SELECT strftime(tv, '%Y-%m-%d') AS cohort_day,
        |  count(*) AS n_view, count(tc) AS n_click, count(tp) AS n_purchase
        |FROM u WHERE tv IS NOT NULL
        |GROUP BY 1 ORDER BY cohort_day""".stripMargin,
    "q_markov" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    make_timestamp(epoch_ns(ts) // 1000) AS ts
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, event_type, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL THEN 1
        |         WHEN epoch_us(ts) // 1000000 - epoch_us(lag(ts) OVER w) // 1000000 > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sess AS (
        |  SELECT user_id, event_type, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged
        |), tr AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id, session_seq
        |                              ORDER BY ts, event_type) AS to_type
        |  FROM sess
        |), c AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n,
        |  CAST(n * 1000000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT)
        |    AS p_micro
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "q_ltv_deciles" ->
      """WITH pu AS (
        |  SELECT user_id, sum(CAST(value AS DECIMAL(18,4))) AS spend,
        |         count(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |), d AS (
        |  SELECT *, ntile(10) OVER (ORDER BY spend DESC, user_id) AS decile
        |  FROM pu
        |)
        |SELECT decile, count(*) AS n_users,
        |  CAST(CAST(round(sum(spend), 2) AS DECIMAL(38,2)) AS DOUBLE)
        |    AS total_spend,
        |  CAST(sum(n_purchases) AS BIGINT) AS n_purchases
        |FROM d GROUP BY 1 ORDER BY decile""".stripMargin,
    // same session chain as q_concurrency (second-truncated gap
    // compare = Spark's cast-to-long), event_type carried through
    "q_top_paths" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    make_timestamp(epoch_ns(ts) // 1000) AS ts
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, event_type, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL THEN 1
        |         WHEN epoch_us(ts) // 1000000 - epoch_us(lag(ts) OVER w) // 1000000 > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sess AS (
        |  SELECT user_id, event_type, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged
        |), paths AS (
        |  SELECT user_id, session_seq,
        |    list(event_type ORDER BY ts, event_type) AS types
        |  FROM sess GROUP BY 1, 2
        |), tri AS (
        |  SELECT unnest(list_transform(generate_series(1, len(types) - 2),
        |    i -> types[i] || '>' || types[i+1] || '>' || types[i+2])) AS path
        |  FROM paths
        |)
        |SELECT path, count(*) AS n FROM tri
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "q_funnel_time" ->
      """WITH st AS (
        |  SELECT user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts
        |            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1
        |  FROM events
        |), st2 AS (
        |  SELECT *, CASE WHEN event_type = 'click' AND ts > cum1 THEN ts END AS s2
        |  FROM st
        |), st3 AS (
        |  SELECT *, min(s2) OVER (PARTITION BY user_id ORDER BY ts
        |            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
        |  FROM st2
        |), st4 AS (
        |  SELECT *, CASE WHEN event_type = 'purchase' AND ts > cum2 THEN ts END AS s3
        |  FROM st3
        |), u AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS tv,
        |    min(s2) AS tc, min(s3) AS tp
        |  FROM st4 GROUP BY user_id
        |), d AS (
        |  SELECT 'view_to_click' AS transition,
        |    epoch_us(tc) // 1000000 - epoch_us(tv) // 1000000 AS sec
        |  FROM u WHERE tc IS NOT NULL
        |  UNION ALL
        |  SELECT 'click_to_purchase',
        |    epoch_us(tp) // 1000000 - epoch_us(tc) // 1000000
        |  FROM u WHERE tp IS NOT NULL
        |)
        |SELECT transition, count(*) AS n,
        |  round(quantile_cont(sec, 0.5), 4) AS p50_sec,
        |  round(quantile_cont(sec, 0.9), 4) AS p90_sec
        |FROM d GROUP BY 1 ORDER BY transition""".stripMargin,
    "q_retention" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), u AS (
        |  SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1
        |)
        |SELECT CAST(u.cohort_day AS VARCHAR) AS cohort_day,
        |  count(DISTINCT u.user_id) AS n_users,
        |  count(DISTINCT CASE WHEN ud.day = u.cohort_day + 1
        |                      THEN ud.user_id END) AS d1,
        |  count(DISTINCT CASE WHEN ud.day = u.cohort_day + 7
        |                      THEN ud.user_id END) AS d7
        |FROM u JOIN ud ON u.user_id = ud.user_id
        |GROUP BY u.cohort_day ORDER BY cohort_day""".stripMargin,
    "q_cumulative_users" ->
      """WITH fs AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1
        |), d AS (
        |  SELECT day, count(*) AS new_users FROM fs GROUP BY 1
        |)
        |SELECT CAST(day AS VARCHAR) AS day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM d ORDER BY day""".stripMargin,
    "q_rolling_users" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), days AS (SELECT DISTINCT day FROM ud)
        |SELECT CAST(d.day AS VARCHAR) AS day,
        |  (SELECT count(DISTINCT u.user_id) FROM ud u
        |   WHERE u.day BETWEEN d.day - 6 AND d.day) AS active_users
        |FROM days d ORDER BY day""".stripMargin,
    "q_argmax_join" ->
      """SELECT n_name, s_suppkey, s_name, s_acctbal
        |FROM supplier
        |JOIN (SELECT s_nationkey AS nk, max(s_acctbal) AS max_bal
        |      FROM supplier GROUP BY 1) mx
        |  ON s_nationkey = nk AND s_acctbal = max_bal
        |JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY n_name, s_suppkey""".stripMargin,
    // Q17 shape: the threshold compare is cross-multiplied BIGINT
    // (2·qty·cnt < sum_qty) — integer-exact in both engines
    "q_small_qty" ->
      """WITH pa AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |    count(*) AS cnt
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT
        |  CAST(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2)
        |       AS DECIMAL(38,2)) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_size < 10
        |JOIN pa ON pa.l_partkey = l.l_partkey
        |WHERE CAST(l.l_quantity AS BIGINT) * cnt * 2 < sum_qty""".stripMargin,
    "q_stock_reserve" ->
      """WITH ex AS (
        |  SELECT l_suppkey
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_name LIKE 'small%'
        |  GROUP BY l_suppkey, l.l_partkey
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 50
        |)
        |SELECT s_name, s_acctbal
        |FROM supplier s
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  AND n.n_name = 'NATION_3'
        |WHERE EXISTS (SELECT 1 FROM ex WHERE ex.l_suppkey = s.s_suppkey)
        |ORDER BY s_name""".stripMargin,
    "q_waiting_supplier" ->
      """WITH ps AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |        THEN 1 ELSE 0 END) AS late
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2
        |), st AS (
        |  SELECT l_orderkey, count(*) AS n_supp,
        |    CAST(sum(late) AS BIGINT) AS n_late
        |  FROM ps GROUP BY 1
        |)
        |SELECT s_name, count(*) AS numwait
        |FROM ps
        |JOIN st USING (l_orderkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE ps.late = 1 AND st.n_supp >= 2 AND st.n_late = 1
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 25""".stripMargin,
    // Q22 shape: the balance threshold is cross-multiplied integer
    // cents (cents·n > Σcents) — no avg/decimal boundary risk
    "q_idle_customers" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |  FROM customer
        |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
        |), pos AS (
        |  SELECT CAST(sum(cents) AS BIGINT) AS sum_cents,
        |    count(*) AS n_pos
        |  FROM cust WHERE c_acctbal > 0
        |)
        |SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2)
        |       AS DECIMAL(38,2)) AS DOUBLE) AS total_bal
        |FROM cust, pos
        |WHERE cents * n_pos > sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = cust.c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_filter_agg" ->
      """SELECT
        |  CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      CAST(l_discount AS DECIMAL(18,4))), 2)
        |    AS DECIMAL(38,2)) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_returned_revenue" ->
      (s"""SELECT c_custkey, c_name, c_acctbal, n_name,
        |  $revenueSql AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""").stripMargin,
    "q_priority_class" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_custdist" ->
      """WITH cc AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey
        |)
        |SELECT c_count, count(*) AS custdist
        |FROM cc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_promo_share" ->
      (s"""WITH agg AS (
        |  SELECT
        |    CAST(CAST(round(sum(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
        |          (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |        END), 2) AS DECIMAL(38,2)) AS DOUBLE) AS promo_rev,
        |    $revenueSql AS total_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |    AND l_shipdate < TIMESTAMP '1997-10-01'
        |)
        |SELECT promo_rev, total_rev,
        |  CAST(floor(promo_rev / total_rev * 1e6) AS BIGINT) AS promo_micro
        |FROM agg""").stripMargin,
    "q_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
        |      AS rev_d
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey
        |)
        |SELECT s_suppkey, s_name,
        |  CAST(CAST(round(rev_d, 2) AS DECIMAL(38,2)) AS DOUBLE) AS total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_d = (SELECT max(rev_d) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q_disjunctive" ->
      (s"""SELECT $revenueSql AS revenue, count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE
        |  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11) OR
        |  (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20) OR
        |  (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)""").stripMargin,
    "q_market_share" ->
      (s"""WITH yr AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |    CAST(CAST(round(sum(CASE WHEN sn.n_name = 'NATION_3'
        |        THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
        |          (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |        END), 2) AS DECIMAL(38,2)) AS DOUBLE) AS nation_rev,
        |    $revenueSql AS total_rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE EXISTS (
        |    SELECT 1 FROM customer c
        |    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |    JOIN region r ON cn.n_regionkey = r.r_regionkey
        |    WHERE c.c_custkey = o_custkey AND r.r_name = 'ASIA')
        |  GROUP BY 1
        |)
        |SELECT o_year, nation_rev, total_rev,
        |  CAST(floor(nation_rev / total_rev * 1e6) AS BIGINT) AS share_micro
        |FROM yr ORDER BY o_year""").stripMargin,
    "q_supplier_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(CAST(round(sum(
        |    CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) -
        |    CAST(p_retailprice AS DECIMAL(18,4)) *
        |      CAST(l_quantity AS DECIMAL(18,4)) *
        |      CAST(0.05 AS DECIMAL(18,4))), 2)
        |    AS DECIMAL(38,2)) AS DOUBLE) AS profit,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name, o_year
        |ORDER BY n_name, o_year""".stripMargin,
    "q_store_roundtrip" -> (txnCte + minuteCte + rollupCte("hour") + "\n" +
      """SELECT symbol, 'HOUR' AS timeframe,
        |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(ws + INTERVAL 1 hour, '%Y-%m-%d %H:%M:%S') AS window_end,
        |  open, high, low, close, volume, n_txn
        |FROM roll_c
        |WHERE symbol = 'purchase' AND ws >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ws < TIMESTAMP '2024-01-20 00:00:00'
        |ORDER BY timeframe, symbol, window_start""".stripMargin),
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DECIMAL(38,2)) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DECIMAL(38,2)) AS DOUBLE) / count(*) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_vwap" -> (txnCte + "\n" +
      """SELECT symbol,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  CAST(CAST(round(sum(CAST(price AS DECIMAL(18,4)) * CAST(quantity AS DECIMAL(18,4))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS pv,
        |  CAST(sum(quantity) AS BIGINT) AS volume,
        |  CASE WHEN sum(quantity) = 0 THEN NULL ELSE
        |    CAST(CAST(round(sum(CAST(price AS DECIMAL(18,4)) * CAST(quantity AS DECIMAL(18,4))), 2) AS DECIMAL(38,2)) AS DOUBLE)
        |      / CAST(sum(quantity) AS BIGINT) END AS vwap
        |FROM txn GROUP BY 1, 2 ORDER BY symbol, window_start""".stripMargin),
    "q_candle_patterns" -> (txnCte + minuteCte + rollupCte("day") +
      """
        |, pat AS (
        |  SELECT symbol, ws, open, high, low, close,
        |    abs(close - open) AS body,
        |    high - greatest(open, close) AS u_sh,
        |    least(open, close) - low AS l_sh,
        |    lag(open) OVER w AS prev_open,
        |    lag(close) OVER w AS prev_close
        |  FROM roll_c
        |  WINDOW w AS (PARTITION BY symbol ORDER BY ws)
        |)
        |SELECT symbol, strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  body * 10 <= high - low AS is_doji,
        |  body > 0 AND l_sh >= body * 2 AND u_sh <= body AS is_hammer,
        |  COALESCE(prev_close < prev_open AND close > open
        |       AND close >= prev_open AND open <= prev_close, FALSE) AS is_engulf_bull,
        |  COALESCE(prev_close > prev_open AND close < open
        |       AND open >= prev_close AND close <= prev_open, FALSE) AS is_engulf_bear
        |FROM pat ORDER BY symbol, window_start""".stripMargin),
    "q_candle_change" -> (txnCte + minuteCte + rollupCte("day") + "\n" +
      """SELECT symbol,
        |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, close,
        |  lag(close, 1) OVER w AS prev_close,
        |  close - lag(close, 1) OVER w AS change,
        |  CAST(sum(CAST(close AS DECIMAL(18,4)))
        |         OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / count(close) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS ma_close
        |FROM roll_c
        |WINDOW w AS (PARTITION BY symbol ORDER BY ws)
        |ORDER BY symbol, window_start""".stripMargin),
    "q_range_join" -> (txnCte + minuteCte + rollupCte("day") +
      """
        |SELECT c.symbol,
        |  strftime(c.ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  c.n_txn, count(*) AS n_matched
        |FROM roll_c c JOIN txn e
        |  ON e.symbol = c.symbol
        |  AND e.ts >= c.ws AND e.ts < c.ws + INTERVAL 1 day
        |GROUP BY c.symbol, c.ws, c.n_txn
        |ORDER BY c.symbol, window_start""".stripMargin),
    "q_asof_join" -> (txnCte.replace(
      "SELECT event_type AS symbol",
      "SELECT event_id, event_type AS symbol") + minuteCte + rollupCte("hour") +
      """, hourly AS (
        |  SELECT symbol, ws + INTERVAL 1 hour AS hts, close AS prev_hour_close
        |  FROM roll_c
        |)
        |SELECT e.event_id, e.symbol,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts, e.price,
        |  h.prev_hour_close AS asof_prev_hour_close
        |FROM txn e ASOF LEFT JOIN hourly h
        |  ON e.symbol = h.symbol AND e.ts >= h.hts
        |ORDER BY event_id""".stripMargin),
    "q_candle_5min" -> (txnCte + minuteCte +
      """, five AS (
        |  SELECT symbol,
        |    make_timestamp((epoch_us(ws) // 1000000) // 300 * 300 * 1000000) AS ws5,
        |    arg_min(open, ws) AS open, max(high) AS high,
        |    min(low) AS low, arg_max(close, ws) AS close,
        |    CAST(sum(volume) AS BIGINT) AS volume,
        |    CAST(sum(n_txn) AS BIGINT) AS n_txn
        |  FROM minute_c GROUP BY 1, 2
        |)
        |SELECT symbol, '300s' AS timeframe,
        |  strftime(ws5, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(ws5 + INTERVAL 300 SECOND, '%Y-%m-%d %H:%M:%S') AS window_end,
        |  open, high, low, close, volume, n_txn
        |FROM five ORDER BY timeframe, symbol, window_start""".stripMargin),
    "q_candle_gapfill" -> (txnCte + minuteCte + rollupCte("hour") +
      """, bounds AS (
        |  SELECT symbol, min(ws) AS lo, max(ws) AS hi FROM roll_c GROUP BY 1
        |), slots AS (
        |  SELECT symbol, unnest(generate_series(lo, hi, INTERVAL 1 hour)) AS ws
        |  FROM bounds
        |), filled AS (
        |  SELECT s.symbol, s.ws, c.close, c.volume
        |  FROM slots s LEFT JOIN roll_c c ON s.symbol = c.symbol AND s.ws = c.ws
        |)
        |SELECT symbol, strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  last_value(close IGNORE NULLS) OVER (PARTITION BY symbol ORDER BY ws
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_filled,
        |  close IS NULL AS is_gap,
        |  CAST(coalesce(volume, 0) AS BIGINT) AS volume
        |FROM filled ORDER BY symbol, window_start""".stripMargin),
    // hop windows align to the epoch (Spark window() default): each
    // txn lands in the 2 windows starting at (slide-floor(ts) - k·300)
    "q_candle_hop" -> (txnCte +
      """, hop AS (
        |  SELECT symbol, price, quantity, ts,
        |    make_timestamp(((epoch_us(ts) // 1000000) // 300 - g.i) * 300 * 1000000) AS ws
        |  FROM txn CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1) g
        |)
        |SELECT symbol, '600s/300s' AS timeframe,
        |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(ws + INTERVAL 600 SECOND, '%Y-%m-%d %H:%M:%S') AS window_end,
        |  arg_min(price, ts) AS open, max(price) AS high,
        |  min(price) AS low, arg_max(price, ts) AS close,
        |  CAST(sum(quantity) AS BIGINT) AS volume, count(*) AS n_txn
        |FROM hop GROUP BY symbol, ws
        |ORDER BY timeframe, symbol, window_start""".stripMargin),
    "q_movers" -> (txnCte + minuteCte + rollupCte("day") +
      """, r AS (
        |  SELECT symbol, ws, close,
        |    lag(close, 1) OVER (PARTITION BY symbol ORDER BY ws) AS prev_close
        |  FROM roll_c
        |), ret AS (
        |  SELECT symbol, ws, close / prev_close - 1.0 AS ret
        |  FROM r WHERE prev_close IS NOT NULL AND prev_close <> 0.0
        |), ranked AS (
        |  SELECT symbol, ws, ret,
        |    row_number() OVER (PARTITION BY ws ORDER BY ret DESC, symbol) AS gain_rank,
        |    row_number() OVER (PARTITION BY ws ORDER BY ret ASC, symbol) AS loss_rank
        |  FROM ret
        |)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS day, symbol,
        |  CASE WHEN gain_rank <= 2 THEN 'gainer' ELSE 'loser' END AS direction,
        |  ret AS "return"
        |FROM ranked WHERE gain_rank <= 2 OR loss_rank <= 2
        |ORDER BY day, direction, symbol""".stripMargin),
    "q_correlation" -> (txnCte + minuteCte + rollupCte("day") +
      """, r AS (
        |  SELECT symbol, ws, close,
        |    lag(close, 1) OVER (PARTITION BY symbol ORDER BY ws) AS prev_close
        |  FROM roll_c
        |), ret AS (
        |  SELECT symbol, ws,
        |    CAST(close / prev_close - 1.0 AS DECIMAL(18,6)) AS ret
        |  FROM r WHERE prev_close IS NOT NULL AND prev_close <> 0.0
        |), pairs AS (
        |  SELECT a.symbol AS sym_a, b.symbol AS sym_b,
        |    CAST(a.ret AS DECIMAL(28,6)) AS ra, CAST(b.ret AS DECIMAL(28,6)) AS rb
        |  FROM ret a JOIN ret b ON a.ws = b.ws AND a.symbol < b.symbol
        |), agg AS (
        |  SELECT sym_a, sym_b, count(*) AS n,
        |    CAST(sum(ra) AS DOUBLE) AS sx, CAST(sum(rb) AS DOUBLE) AS sy,
        |    CAST(CAST(round(sum(ra * rb), 6) AS DECIMAL(38,6)) AS DOUBLE) AS sxy,
        |    CAST(CAST(round(sum(ra * ra), 6) AS DECIMAL(38,6)) AS DOUBLE) AS sxx,
        |    CAST(CAST(round(sum(rb * rb), 6) AS DECIMAL(38,6)) AS DOUBLE) AS syy
        |  FROM pairs GROUP BY 1, 2
        |)
        |SELECT sym_a, sym_b, n,
        |  CASE WHEN sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy) <> 0.0
        |       THEN (n * sxy - sx * sy) /
        |            (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |       END AS corr
        |FROM agg ORDER BY sym_a, sym_b""".stripMargin),
    // trough day = earliest day attaining the min drawdown: DuckDB's
    // arg_min has no composite-key overload, so the tiebreak is a
    // join-back on the exact (bit-identical) min value
    "q_drawdown" -> (txnCte + minuteCte + rollupCte("day") +
      """, dd AS (
        |  SELECT symbol, ws,
        |    close / max(close) OVER (PARTITION BY symbol ORDER BY ws
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1.0 AS dd
        |  FROM roll_c
        |), mins AS (
        |  SELECT symbol, min(dd) AS max_drawdown FROM dd GROUP BY 1
        |)
        |SELECT d.symbol, m.max_drawdown,
        |  strftime(min(d.ws), '%Y-%m-%d %H:%M:%S') AS trough_day
        |FROM dd d JOIN mins m ON d.symbol = m.symbol AND d.dd = m.max_drawdown
        |GROUP BY d.symbol, m.max_drawdown ORDER BY d.symbol""".stripMargin),
    "q_lag_features" -> (txnCte + minuteCte + rollupCte("day") +
      """, r AS (
        |  SELECT symbol, ws, close,
        |    lag(close, 1) OVER (PARTITION BY symbol ORDER BY ws) AS prev_close
        |  FROM roll_c
        |), f AS (
        |  SELECT symbol, ws, close,
        |    CASE WHEN prev_close IS NOT NULL AND prev_close <> 0.0
        |         THEN CAST(close / prev_close - 1.0 AS DECIMAL(18,6)) END AS ret
        |  FROM r
        |), g AS (
        |  SELECT symbol, ws,
        |    CAST(ret AS DOUBLE) AS ret,
        |    CAST(lag(ret, 1) OVER w AS DOUBLE) AS ret_lag1,
        |    CAST(sum(CAST(close AS DECIMAL(18,2))) OVER w7 AS DOUBLE)
        |      / count(close) OVER w7 AS ma7,
        |    count(ret) OVER w7 AS n,
        |    CAST(sum(CAST(ret AS DECIMAL(28,6))) OVER w7 AS DOUBLE) AS sx,
        |    CAST(sum(CAST(round(CAST(ret AS DECIMAL(19,6)) * CAST(ret AS DECIMAL(19,6)), 6)
        |                  AS DECIMAL(38,6))) OVER w7 AS DOUBLE) AS sxx
        |  FROM f
        |  WINDOW w AS (PARTITION BY symbol ORDER BY ws),
        |         w7 AS (PARTITION BY symbol ORDER BY ws
        |                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |)
        |SELECT symbol, strftime(ws, '%Y-%m-%d %H:%M:%S') AS day,
        |  ret, ret_lag1, ma7,
        |  CASE WHEN n > 1
        |       THEN sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0.0)) END AS vol7
        |FROM g ORDER BY symbol, day""".stripMargin),
    "q_spearman" -> (txnCte + minuteCte + rollupCte("day") +
      """, r AS (
        |  SELECT symbol, ws, close,
        |    lag(close, 1) OVER (PARTITION BY symbol ORDER BY ws) AS prev_close
        |  FROM roll_c
        |), ret AS (
        |  SELECT symbol, ws,
        |    CAST(close / prev_close - 1.0 AS DECIMAL(18,6)) AS ret
        |  FROM r WHERE prev_close IS NOT NULL AND prev_close <> 0.0
        |), rk AS (
        |  SELECT symbol, ws,
        |    row_number() OVER (PARTITION BY symbol ORDER BY ret, ws) AS rk
        |  FROM ret
        |), agg AS (
        |  SELECT a.symbol AS sym_a, b.symbol AS sym_b, count(*) AS n,
        |    sum((a.rk - b.rk) * (a.rk - b.rk)) AS d2
        |  FROM rk a JOIN rk b ON a.ws = b.ws AND a.symbol < b.symbol
        |  GROUP BY 1, 2
        |)
        |SELECT sym_a, sym_b, n,
        |  CAST(CASE WHEN n > 1
        |    THEN 1000000 - (6000000 * d2) // (n * (n * n - 1)) END AS BIGINT)
        |    AS spearman_micro
        |FROM agg ORDER BY sym_a, sym_b""".stripMargin),
    "q_beta" -> (txnCte + minuteCte + rollupCte("day") +
      """, r AS (
        |  SELECT symbol, ws, close,
        |    lag(close, 1) OVER (PARTITION BY symbol ORDER BY ws) AS prev_close
        |  FROM roll_c
        |), ret AS (
        |  SELECT symbol, ws,
        |    CAST(close / prev_close - 1.0 AS DECIMAL(18,6)) AS ret
        |  FROM r WHERE prev_close IS NOT NULL AND prev_close <> 0.0
        |), m AS (
        |  SELECT ws, CAST(ret AS DECIMAL(28,6)) AS rm FROM ret
        |  WHERE symbol = 'view'
        |), j AS (
        |  SELECT a.symbol, CAST(a.ret AS DECIMAL(28,6)) AS rx, m.rm
        |  FROM ret a JOIN m ON a.ws = m.ws WHERE a.symbol <> 'view'
        |), agg AS (
        |  SELECT symbol, count(*) AS n,
        |    CAST(sum(rx) AS DOUBLE) AS sx, CAST(sum(rm) AS DOUBLE) AS sm,
        |    CAST(CAST(round(sum(rx * rm), 6) AS DECIMAL(38,6)) AS DOUBLE) AS sxm,
        |    CAST(CAST(round(sum(rm * rm), 6) AS DECIMAL(38,6)) AS DOUBLE) AS smm
        |  FROM j GROUP BY 1
        |)
        |SELECT symbol, n,
        |  CASE WHEN n * smm - sm * sm <> 0.0
        |       THEN (n * sxm - sx * sm) / (n * smm - sm * sm) END AS beta
        |FROM agg ORDER BY symbol""".stripMargin),
    "q_bollinger" -> (txnCte + minuteCte + rollupCte("day") + "\n" +
      """, b AS (
        |  SELECT symbol, ws, close,
        |    CAST(sum(CAST(close AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s1,
        |    CAST(sum(CAST(close AS DECIMAL(18,2)) * CAST(close AS DECIMAL(18,2)))
        |         OVER w AS DOUBLE) AS s2,
        |    count(close) OVER w AS cnt
        |  FROM roll_c
        |  WINDOW w AS (PARTITION BY symbol ORDER BY ws
        |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |)
        |SELECT symbol, strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, close,
        |  s1 / cnt AS ma,
        |  sqrt(greatest(CASE WHEN cnt > 1 THEN (s2 - s1 * s1 / cnt) / (cnt - 1)
        |                     ELSE 0.0 END, 0.0)) AS sd,
        |  s1 / cnt + 2.0 * sqrt(greatest(CASE WHEN cnt > 1
        |    THEN (s2 - s1 * s1 / cnt) / (cnt - 1) ELSE 0.0 END, 0.0)) AS upper,
        |  s1 / cnt - 2.0 * sqrt(greatest(CASE WHEN cnt > 1
        |    THEN (s2 - s1 * s1 / cnt) / (cnt - 1) ELSE 0.0 END, 0.0)) AS lower
        |FROM b ORDER BY symbol, window_start""".stripMargin),
    "q_rsi" -> (txnCte + minuteCte + rollupCte("day") + "\n" +
      """, ch AS (
        |  SELECT symbol, ws, close,
        |    close - lag(close, 1) OVER (PARTITION BY symbol ORDER BY ws) AS change
        |  FROM roll_c
        |), g AS (
        |  SELECT symbol, ws, close,
        |    CAST(sum(CAST(CASE WHEN change > 0 THEN change ELSE 0.0 END
        |      AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_gain,
        |    CAST(sum(CAST(CASE WHEN change < 0 THEN -change ELSE 0.0 END
        |      AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_loss
        |  FROM ch
        |  WINDOW w AS (PARTITION BY symbol ORDER BY ws
        |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT symbol, strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, close,
        |  CASE WHEN sum_loss = 0.0 THEN 100.0
        |       ELSE 100.0 - 100.0 / (1.0 + sum_gain / sum_loss) END AS rsi
        |FROM g ORDER BY symbol, window_start""".stripMargin),
    // q_ema oracle: the per-symbol recurrence as a recursive CTE. The
    // arithmetic mirrors MarketAnalytics.ema bit-for-bit: both sides
    // compute alpha = 2.0/13.0 and alpha*close + (1-alpha)*prev as
    // IEEE doubles in the same operation order, so the raw doubles
    // hash-match (no rounding needed).
    "q_ema" -> (txnCte.replace("WITH txn", "WITH RECURSIVE txn") + minuteCte +
      rollupCte("day") +
      """, ordered AS (
        |  SELECT symbol, ws, close,
        |    row_number() OVER (PARTITION BY symbol ORDER BY ws) AS rn
        |  FROM roll_c
        |), ema_rec AS (
        |  SELECT symbol, ws, close, rn, close AS ema FROM ordered WHERE rn = 1
        |  UNION ALL
        |  SELECT o.symbol, o.ws, o.close, o.rn,
        |    (2.0 / 13.0) * o.close + (1.0 - (2.0 / 13.0)) * e.ema
        |  FROM ema_rec e JOIN ordered o ON o.symbol = e.symbol AND o.rn = e.rn + 1
        |)
        |SELECT symbol, strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, close, ema
        |FROM ema_rec ORDER BY symbol, window_start""".stripMargin),
    "q_session_window" ->
      """WITH ev AS (
        |  SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, value
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL THEN 1
        |         WHEN ts >= lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1
        |         ELSE 0 END AS is_new
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sess AS (
        |  SELECT user_id, ts, value,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        |  FROM flagged
        |)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events,
        |  CAST(CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS total_value
        |FROM sess GROUP BY user_id, seq
        |ORDER BY user_id, session_start""".stripMargin,
    "q_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, value
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL THEN 1
        |         WHEN epoch_us(ts) // 1000000 - epoch_us(lag(ts) OVER w) // 1000000 > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sess AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged
        |)
        |SELECT user_id, session_seq,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events,
        |  CAST(CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS total_value
        |FROM sess GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
        |  o_orderpriority,
        |  CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_multijoin" ->
      """SELECT n_name,
        |  CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM region, nation, customer, orders, lineitem
        |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
        |  AND c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_topk_group" ->
      """SELECT p_brand, rk, p_partkey, p_name, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_name, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part
        |) WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 10000) AS INTEGER) * 10000 AS bucket_lo,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY bucket_lo""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n,
        |  CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
        |       AS DECIMAL(38,2)) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  CAST(CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_orderkey) AS n_orders, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_semi_anti" ->
      """SELECT c_mktsegment,
        |  CAST(count(CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |    THEN 1 END) AS BIGINT) AS n_with_orders,
        |  CAST(count(CASE WHEN NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |    THEN 1 END) AS BIGINT) AS n_without_orders
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // integer PageRank unrolled to the same 3 iterations; floor
    // division at every step makes each iterate bit-identical
    "q_pagerank" ->
      """WITH e0 AS (
        |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE year(o_orderdate) = 1996
        |), sym AS (
        |  SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0
        |), deg AS (
        |  SELECT src AS node, count(*) AS deg FROM sym GROUP BY 1
        |), nn AS (SELECT count(*) AS n FROM deg),
        |pr0 AS (SELECT node, deg, 1000000000000 // n AS pr FROM deg, nn),
        |it1 AS (SELECT s.dst AS node, sum(p.pr // p.deg) AS csum
        |        FROM sym s JOIN pr0 p ON s.src = p.node GROUP BY 1),
        |pr1 AS (SELECT d.node, d.deg,
        |          (15 * 1000000000000) // (100 * nn.n) + (85 * i.csum) // 100 AS pr
        |        FROM it1 i JOIN deg d ON i.node = d.node, nn),
        |it2 AS (SELECT s.dst AS node, sum(p.pr // p.deg) AS csum
        |        FROM sym s JOIN pr1 p ON s.src = p.node GROUP BY 1),
        |pr2 AS (SELECT d.node, d.deg,
        |          (15 * 1000000000000) // (100 * nn.n) + (85 * i.csum) // 100 AS pr
        |        FROM it2 i JOIN deg d ON i.node = d.node, nn),
        |it3 AS (SELECT s.dst AS node, sum(p.pr // p.deg) AS csum
        |        FROM sym s JOIN pr2 p ON s.src = p.node GROUP BY 1),
        |pr3 AS (SELECT d.node, d.deg,
        |          (15 * 1000000000000) // (100 * nn.n) + (85 * i.csum) // 100 AS pr
        |        FROM it3 i JOIN deg d ON i.node = d.node, nn)
        |SELECT node, CAST(pr AS BIGINT) AS pr_int
        |FROM pr3 ORDER BY pr_int DESC, node LIMIT 50""".stripMargin,
    "q_dq_report" ->
      """SELECT 'lineitem_orphan_orderkey' AS "check", count(*) AS n_violations
        |FROM lineitem WHERE NOT EXISTS
        |  (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |UNION ALL
        |SELECT 'orders_orphan_custkey', count(*)
        |FROM orders WHERE NOT EXISTS
        |  (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |UNION ALL
        |SELECT 'orders_duplicate_pk', count(*) FROM
        |  (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
        |UNION ALL
        |SELECT 'lineitem_nonpositive_price', count(*)
        |FROM lineitem WHERE l_extendedprice <= 0
        |UNION ALL
        |SELECT 'lineitem_discount_range', count(*)
        |FROM lineitem WHERE l_discount < 0 OR l_discount > 1
        |UNION ALL
        |SELECT 'events_null_user', count(*) FROM events WHERE user_id IS NULL
        |ORDER BY "check"""".stripMargin,
    "q_latest_snapshot" ->
      """SELECT user_id, event_type,
        |  strftime(make_timestamp(epoch_ns(max(ts)) // 1000),
        |           '%Y-%m-%d %H:%M:%S') AS last_ts,
        |  list(value ORDER BY ts DESC, value DESC)[1] AS last_value,
        |  count(*) AS n_events
        |FROM events GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin,
    "q_seasonality" ->
      """WITH h AS (
        |  SELECT event_type, hour(ts) AS hh, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, hh, n,
        |  CAST(n * 1000000 // sum(n) OVER (PARTITION BY event_type) AS BIGINT)
        |    AS share_micro
        |FROM h ORDER BY event_type, hh""".stripMargin,
    "q_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q_corr_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,4)) *
        |      (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) >
        |      2 * (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,4)))
        |           FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_having" ->
      """SELECT c_custkey, c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
        |       AS DECIMAL(38,2)) AS DOUBLE) AS total_spend
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_mktsegment
        |HAVING MAX(o_totalprice) > 400000.0
        |ORDER BY c_custkey""".stripMargin,
    "q_multi_dist" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_ord,
        |  count(*) AS n_lines
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_rank_funcs" ->
      """SELECT p_brand, p_partkey, p_retailprice,
        |  CAST(floor(percent_rank() OVER w * 1e6) AS BIGINT) AS pr_micro,
        |  CAST(floor(cume_dist() OVER w * 1e6) AS BIGINT) AS cd_micro,
        |  nth_value(p_partkey, 2) OVER (PARTITION BY p_brand
        |    ORDER BY p_retailprice, p_partkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
        |ORDER BY p_brand, p_retailprice, p_partkey""".stripMargin,
    "q_window_funcs" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |  ntile(4) OVER w AS quartile,
        |  lead(l_extendedprice, 1) OVER w AS next_price,
        |  first_value(l_extendedprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS min_price
        |FROM lineitem WHERE l_orderkey <= 1000
        |WINDOW w AS (PARTITION BY l_returnflag
        |             ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |ORDER BY l_returnflag, l_extendedprice, l_orderkey, l_linenumber""".stripMargin,
    "q_setops" ->
      """WITH b96 AS (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |), b97 AS (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |)
        |SELECT o_custkey, 'both' AS cohort FROM (SELECT o_custkey FROM b96 INTERSECT SELECT o_custkey FROM b97)
        |UNION ALL
        |SELECT o_custkey, 'only_1996' AS cohort FROM (SELECT o_custkey FROM b96 EXCEPT SELECT o_custkey FROM b97)
        |ORDER BY cohort, o_custkey""".stripMargin,
    "q_mad" ->
      """WITH med AS (
        |  SELECT event_type, round(quantile_cont(value, 0.5), 4) AS median
        |  FROM events GROUP BY 1
        |), dev AS (
        |  SELECT e.event_type, abs(e.value - m.median) AS adev
        |  FROM events e JOIN med m ON e.event_type = m.event_type
        |)
        |SELECT d.event_type, m.median,
        |  round(quantile_cont(d.adev, 0.5), 4) AS mad
        |FROM dev d JOIN med m ON d.event_type = m.event_type
        |GROUP BY d.event_type, m.median ORDER BY d.event_type""".stripMargin,
    "q_ab_test" ->
      """WITH c AS (
        |  SELECT event_type, value,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |         THEN 'A' ELSE 'B' END AS cohort
        |  FROM events
        |), agg AS (
        |  SELECT event_type, cohort, count(*) AS n,
        |    CAST(CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2)
        |         AS DECIMAL(38,2)) AS DOUBLE) AS sx,
        |    CAST(CAST(round(sum(CAST(value AS DECIMAL(18,4)) *
        |                        CAST(value AS DECIMAL(18,4))), 4)
        |         AS DECIMAL(38,4)) AS DOUBLE) AS sxx
        |  FROM c GROUP BY 1, 2
        |), wide AS (
        |  SELECT event_type,
        |    max(CASE WHEN cohort = 'A' THEN n END) AS n_a,
        |    max(CASE WHEN cohort = 'B' THEN n END) AS n_b,
        |    max(CASE WHEN cohort = 'A' THEN sx END) AS sx_a,
        |    max(CASE WHEN cohort = 'B' THEN sx END) AS sx_b,
        |    max(CASE WHEN cohort = 'A' THEN sxx END) AS sxx_a,
        |    max(CASE WHEN cohort = 'B' THEN sxx END) AS sxx_b
        |  FROM agg GROUP BY 1
        |)
        |SELECT event_type, n_a, n_b,
        |  sx_a / n_a AS mean_a, sx_b / n_b AS mean_b,
        |  (sx_a / n_a - sx_b / n_b) * (sx_a / n_a - sx_b / n_b) /
        |  ((sxx_a - sx_a * sx_a / n_a) / (n_a - 1) / n_a +
        |   (sxx_b - sx_b * sx_b / n_b) / (n_b - 1) / n_b) AS t2
        |FROM wide ORDER BY event_type""".stripMargin,
    "q_approx_quantile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS exact_p95,
        |  TRUE AS p50_in_bound, TRUE AS p95_in_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_clip_outliers" ->
      """WITH thr AS (
        |  SELECT event_type, round(quantile_cont(value, 0.01), 4) AS p01,
        |         round(quantile_cont(value, 0.99), 4) AS p99
        |  FROM events GROUP BY 1
        |)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN value < p01 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low,
        |  CAST(sum(CASE WHEN value > p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high,
        |  min(greatest(least(value, p99), p01)) AS min_clipped,
        |  max(greatest(least(value, p99), p01)) AS max_clipped
        |FROM events JOIN thr USING (event_type)
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_json" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  count(json_extract_string(props, '$.k')) AS n_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_text_stats" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents
        |)
        |SELECT doc_id, length(text) AS n_chars,
        |  len(toks) AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS n_bpeish,
        |  CASE WHEN len(toks) > 0 THEN
        |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(toks)
        |    ELSE 0.0 END AS mean_word_len,
        |  CASE WHEN length(text) > 0 THEN
        |    CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) / length(text)
        |    ELSE 0.0 END AS punct_ratio
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, text, toks,
        |    CASE WHEN len(toks) > 0 THEN
        |      CAST(len(list_filter(toks, x -> list_contains(
        |        ['the','a','an','and','of','to','in','is','it','that'], x))) AS DOUBLE)
        |        / len(toks) ELSE 0.0 END AS stopword_ratio,
        |    CASE WHEN len(toks) > 0 THEN
        |      CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(toks)
        |      ELSE 0.0 END AS mean_word_len,
        |    CASE WHEN length(text) > 0 THEN
        |      CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) / length(text)
        |      ELSE 0.0 END AS punct_ratio
        |  FROM t
        |)
        |SELECT doc_id, stopword_ratio,
        |  round(0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
        |      + 0.2 * (CASE WHEN mean_word_len BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.0 END)
        |      + 0.2 * (CASE WHEN punct_ratio BETWEEN 0.0 AND 0.2 THEN 1.0 ELSE 0.0 END)
        |      + 0.2 * least(stopword_ratio * 5.0, 1.0), 6) AS quality
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_corpus_mix" ->
      """WITH t AS (
        |  SELECT source, lang, text,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents
        |), m AS (
        |  SELECT source, lang, toks,
        |    round(0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
        |      + 0.2 * (CASE WHEN (CASE WHEN len(toks) > 0 THEN
        |          CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(toks)
        |          ELSE 0.0 END) BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.0 END)
        |      + 0.2 * (CASE WHEN (CASE WHEN length(text) > 0 THEN
        |          CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) / length(text)
        |          ELSE 0.0 END) BETWEEN 0.0 AND 0.2 THEN 1.0 ELSE 0.0 END)
        |      + 0.2 * least((CASE WHEN len(toks) > 0 THEN
        |          CAST(len(list_filter(toks, x -> list_contains(
        |            ['the','a','an','and','of','to','in','is','it','that'], x))) AS DOUBLE)
        |            / len(toks) ELSE 0.0 END) * 5.0, 1.0), 6) AS quality
        |  FROM t
        |)
        |SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
        |  CAST(sum(CAST(quality AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS quality_sum_micro,
        |  CAST(sum(CAST(quality AS DECIMAL(18,6))) * 1000000 AS BIGINT) // count(*) AS mean_quality_micro
        |FROM m GROUP BY 1, 2 ORDER BY source, lang""".stripMargin,
    "q_lang_id" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents
        |), sc AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, x -> list_contains(['the','and','of','is','that'], x))) AS en,
        |    len(list_filter(toks, x -> list_contains(['el','los','las','es','y'], x))) AS es,
        |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], x))) AS de,
        |    len(list_filter(toks, x -> list_contains(['le','les','est','et','dans'], x))) AS fr,
        |    length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS zh
        |  FROM t
        |)
        |SELECT doc_id,
        |  CASE WHEN greatest(en, es, de, fr, zh) = 0 THEN 'unknown'
        |       WHEN en = greatest(en, es, de, fr, zh) THEN 'en'
        |       WHEN es = greatest(en, es, de, fr, zh) THEN 'es'
        |       WHEN de = greatest(en, es, de, fr, zh) THEN 'de'
        |       WHEN fr = greatest(en, es, de, fr, zh) THEN 'fr'
        |       ELSE 'zh' END AS lang_pred
        |FROM sc ORDER BY doc_id""".stripMargin,
    "q_vocab" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> len(x) > 0)) AS token
        |  FROM documents
        |) GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "q_cooccur" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                  x -> len(x) > 0)) AS toks
        |  FROM documents
        |), dt AS (
        |  SELECT doc_id, unnest(toks) AS token FROM tok
        |), vocab AS (
        |  SELECT token, count(*) AS df FROM dt GROUP BY token
        |  ORDER BY df DESC, token LIMIT 50
        |), dv AS (
        |  SELECT doc_id, token FROM dt JOIN vocab USING (token)
        |), pc AS (
        |  SELECT a.token AS tok_a, b.token AS tok_b, count(*) AS c_ab
        |  FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.token < b.token
        |  GROUP BY 1, 2
        |), n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT tok_a, tok_b, c_ab, va.df AS df_a, vb.df AS df_b,
        |  CAST(CAST(c_ab AS HUGEINT) * n_docs * 1000000
        |       // (CAST(va.df AS HUGEINT) * vb.df) AS BIGINT) AS lift_micro
        |FROM pc
        |JOIN vocab va ON tok_a = va.token
        |JOIN vocab vb ON tok_b = vb.token
        |CROSS JOIN n
        |ORDER BY c_ab DESC, tok_a, tok_b LIMIT 50""".stripMargin,
    "q_bigrams" ->
      """WITH t AS (
        |  SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |         x -> len(x) > 0) AS tk
        |  FROM documents
        |), b AS (
        |  SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
        |         i -> tk[i] || ' ' || tk[i+1])) AS bigram
        |  FROM t WHERE len(tk) >= 2
        |)
        |SELECT bigram, count(*) AS n FROM b
        |GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "q_fluency" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |         x -> len(x) > 0) AS tk
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 1),
        |         i -> tk[i] || ' ' || tk[i+1])) AS bigram
        |  FROM t WHERE len(tk) >= 2
        |), ref AS (
        |  SELECT bigram, count(*) AS ref_n FROM b
        |  WHERE md5(CAST(doc_id AS VARCHAR)) < 'cccd'
        |  GROUP BY 1
        |)
        |SELECT b.doc_id, count(*) AS n_bigrams,
        |  CAST(sum(coalesce(ref.ref_n, 0)) * 1000000 // count(*) AS BIGINT)
        |    AS fluency_micro
        |FROM b LEFT JOIN ref USING (bigram)
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,
    "q_split" ->
      """SELECT doc_id,
        |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cccd' THEN 'train'
        |       ELSE 'eval' END AS cohort
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_epoch_shuffle" ->
      """WITH hx AS (
        |  SELECT doc_id, md5('7:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, h,
        |    CAST(CAST('0x' || substr(h, 1, 8) AS UBIGINT) % 8 AS BIGINT) AS shard
        |  FROM hx
        |)
        |SELECT shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
        |    AS BIGINT) AS pos,
        |  doc_id, h
        |FROM sh ORDER BY shard, pos""".stripMargin,
    "q_winnow" -> SketchOracles.winnowSql,
    "q_decontaminate" ->
      """WITH tt AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0) AS toks
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id,
        |    CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cccd' THEN 'train'
        |         ELSE 'eval' END AS cohort,
        |    unnest(list_distinct(list_transform(generate_series(1, len(toks) - 4),
        |      i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS gram
        |  FROM tt WHERE len(toks) >= 5
        |), ev AS (SELECT DISTINCT gram FROM grams WHERE cohort = 'eval')
        |SELECT doc_id, count(*) AS n_shared
        |FROM grams JOIN ev USING (gram)
        |WHERE cohort = 'train'
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // semantic contamination replica: micro-floored cosine pairs over
    // the train×eval cross join, argmax replayed as max(sim_micro)
    // then min(eval_id) among the maxima — the integer tie-break the
    // engine's max(struct(sim_micro, -eval_id)) computes
    "q_decontaminate_semantic" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb,
        |    ((vec_id % 10) + 10) % 10 = 0 AS is_eval
        |  FROM embeddings
        |), p AS (
        |  SELECT t.vec_id AS train_id, v.vec_id AS eval_id,
        |    CAST(floor(list_cosine_similarity(t.emb, v.emb) * 1000000)
        |      AS BIGINT) AS sim_micro
        |  FROM (SELECT * FROM e WHERE NOT is_eval) t,
        |       (SELECT * FROM e WHERE is_eval) v
        |), f AS (
        |  SELECT * FROM p WHERE sim_micro >= 350000
        |), g AS (
        |  SELECT train_id, max(sim_micro) AS sim_micro,
        |         count(*) AS n_hits
        |  FROM f GROUP BY train_id
        |)
        |SELECT g.train_id AS train_id, min(f.eval_id) AS eval_id,
        |       g.sim_micro AS sim_micro, g.n_hits AS n_hits
        |FROM g JOIN f ON f.train_id = g.train_id
        |  AND f.sim_micro = g.sim_micro
        |GROUP BY g.train_id, g.sim_micro, g.n_hits
        |ORDER BY g.train_id""".stripMargin,
    // same ground truth as q_decontaminate: the bloom prefilter is a
    // plan-level change only (false positives die in the verify join)
    "q_decontaminate_bloom" ->
      """WITH tt AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0) AS toks
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id,
        |    CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cccd' THEN 'train'
        |         ELSE 'eval' END AS cohort,
        |    unnest(list_distinct(list_transform(generate_series(1, len(toks) - 4),
        |      i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS gram
        |  FROM tt WHERE len(toks) >= 5
        |), ev AS (SELECT DISTINCT gram FROM grams WHERE cohort = 'eval')
        |SELECT doc_id, count(*) AS n_shared
        |FROM grams JOIN ev USING (gram)
        |WHERE cohort = 'train'
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_pii_redact" -> {
      // same Java-regex/RE2-portable patterns the operator uses
      val em = Curation.emailRe; val ph = Curation.phoneRe; val id = Curation.longNumRe
      s"""WITH a AS (
         |  SELECT doc_id, text,
         |    regexp_replace(text, '$em', '<EMAIL>', 'g') AS r1
         |  FROM documents
         |), b AS (
         |  SELECT doc_id, text, r1,
         |    regexp_replace(r1, '$ph', '<PHONE>', 'g') AS r2
         |  FROM a
         |)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$em')) AS INTEGER) AS n_emails,
         |  CAST(len(regexp_extract_all(r1, '$ph')) AS INTEGER) AS n_phones,
         |  CAST(len(regexp_extract_all(r2, '$id')) AS INTEGER) AS n_ids,
         |  md5(regexp_replace(r2, '$id', '<ID>', 'g')) AS redacted_md5
         |FROM b ORDER BY doc_id""".stripMargin
    },
    "q_repetition" ->
      """WITH tt AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0) AS toks
        |  FROM documents
        |), ex AS (
        |  SELECT doc_id, unnest(toks) AS t FROM tt WHERE len(toks) > 0
        |), cnt AS (
        |  SELECT doc_id, t, count(*) AS c FROM ex GROUP BY 1, 2
        |), agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_distinct, max(c) AS top_freq
        |  FROM cnt GROUP BY doc_id
        |), tri AS (
        |  SELECT doc_id, greatest(len(toks) - 2, 0) AS n_tri,
        |    len(list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |      i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS n_tri_distinct
        |  FROM tt WHERE len(toks) > 0
        |)
        |SELECT doc_id, n_tokens, n_distinct,
        |  CAST(floor((1.0 - CAST(n_distinct AS DOUBLE) / n_tokens) * 1000000) AS BIGINT)
        |    AS dup_token_micro,
        |  CAST(floor(CAST(top_freq AS DOUBLE) / n_tokens * 1000000) AS BIGINT)
        |    AS top_token_micro,
        |  CASE WHEN n_tri > 0 THEN
        |    CAST(floor((1.0 - CAST(n_tri_distinct AS DOUBLE) / n_tri) * 1000000) AS BIGINT)
        |    ELSE 0 END AS dup_trigram_micro
        |FROM agg JOIN tri USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_sample_stratified" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    CAST(coalesce(TRY_CAST(substr(source, 4) AS INTEGER), 0) % 4 + 1
        |      AS INTEGER) AS rq
        |  FROM documents
        |)
        |SELECT source, any_value(rq) AS rate_quarters, count(*) AS n_total,
        |  CAST(sum(CASE WHEN md5(CAST(doc_id AS VARCHAR)) <
        |    (CASE rq WHEN 1 THEN '4000' WHEN 2 THEN '8000'
        |             WHEN 3 THEN 'c000' ELSE 'ffff' END)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    // oracle is the single global per-stratum rank — the operator's
    // bucketed two-level rank must coincide with it exactly
    "q_sample_topn" ->
      """WITH r AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents
        |)
        |SELECT source, CAST(rk AS INTEGER) AS rk, doc_id
        |FROM r WHERE rk <= 40 ORDER BY source, rk""".stripMargin,
    // same quality/lang/sample/dedup rules as their standalone oracles,
    // composed into the intake funnel counts
    // q_ingest_quarantine: the corruption rule is a pure function of
    // doc_id (json: % 50, csv: % 71) and both bad-line shapes are
    // deterministic strings, so the oracle reproduces every aggregate
    // of the PERMISSIVE parse split from the parquet table alone —
    // good-side ids/lengths, quarantined raw-record lengths, AND the
    // content-addressable quarantine fingerprints (Σ 60-bit md5
    // prefixes mod 2^61, exact in HUGEINT — see
    // Ingest.recordFingerprint): a future driver red discriminates
    // "roundtrip content differs" from "parse split differs" in one bit
    "q_ingest_quarantine" ->
      s"""SELECT * FROM
        | (SELECT count(*) AS n_json_good,
        |         CAST(sum(doc_id) AS BIGINT) AS sum_json_good_ids,
        |         CAST(sum(length(text)) AS BIGINT) AS sum_json_good_text_len
        |  FROM documents WHERE doc_id % 50 <> 0)
        |CROSS JOIN
        | (SELECT count(*) AS n_json_quarantined,
        |         CAST(sum(length('{corrupt drop line for doc '
        |                    || CAST(doc_id AS VARCHAR))) AS BIGINT)
        |           AS sum_json_quarantined_len,
        |         ${fpSql("'{corrupt drop line for doc ' || CAST(doc_id AS VARCHAR)")}
        |           AS json_quarantine_fp
        |  FROM documents WHERE doc_id % 50 = 0)
        |CROSS JOIN
        | (SELECT count(*) AS n_csv_good,
        |         CAST(sum(length(text)) AS BIGINT) AS sum_csv_good_n
        |  FROM documents WHERE doc_id % 71 <> 0)
        |CROSS JOIN
        | (SELECT count(*) AS n_csv_quarantined,
        |         CAST(sum(length(CAST(doc_id AS VARCHAR)
        |                    || ',notanumber')) AS BIGINT)
        |           AS sum_csv_quarantined_len,
        |         ${fpSql("CAST(doc_id AS VARCHAR) || ',notanumber'")}
        |           AS csv_quarantine_fp
        |  FROM documents WHERE doc_id % 71 = 0)
        |""".stripMargin,
    "q_corpus_intake" ->
      """WITH t AS (
        |  SELECT doc_id, source, lang, text,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, source, lang, text, toks,
        |    round(0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
        |      + 0.2 * (CASE WHEN (CASE WHEN len(toks) > 0 THEN
        |          CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(toks)
        |          ELSE 0.0 END) BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.0 END)
        |      + 0.2 * (CASE WHEN (CASE WHEN length(text) > 0 THEN
        |          CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) / length(text)
        |          ELSE 0.0 END) BETWEEN 0.0 AND 0.2 THEN 1.0 ELSE 0.0 END)
        |      + 0.2 * least((CASE WHEN len(toks) > 0 THEN
        |          CAST(len(list_filter(toks, x -> list_contains(
        |            ['the','a','an','and','of','to','in','is','it','that'], x))) AS DOUBLE)
        |            / len(toks) ELSE 0.0 END) * 5.0, 1.0), 6) AS quality,
        |    len(list_filter(toks, x -> list_contains(['the','and','of','is','that'], x))) AS en,
        |    len(list_filter(toks, x -> list_contains(['el','los','las','es','y'], x))) AS es,
        |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], x))) AS de,
        |    len(list_filter(toks, x -> list_contains(['le','les','est','et','dans'], x))) AS fr,
        |    length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS zh
        |  FROM t
        |), v AS (
        |  SELECT doc_id, source, lang, text,
        |    NOT (len(toks) < 40 OR greatest(en, es, de, fr, zh) = 0
        |         OR quality < 0.5) AS kept
        |  FROM m
        |), s AS (
        |  SELECT *, md5(CAST(doc_id AS VARCHAR)) <
        |    (CASE (coalesce(TRY_CAST(substr(source, 4) AS INTEGER), 0) % 4 + 1)
        |       WHEN 1 THEN '4000' WHEN 2 THEN '8000'
        |       WHEN 3 THEN 'c000' ELSE 'ffff' END) AS sampled
        |  FROM v
        |), c AS (
        |  SELECT *, kept AND sampled AS cohort,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ch
        |  FROM s
        |), k AS (
        |  SELECT *, min(CASE WHEN cohort THEN doc_id END)
        |    OVER (PARTITION BY ch) AS keep_id
        |  FROM c
        |)
        |SELECT source, lang, count(*) AS n_raw,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
        |  CAST(sum(CASE WHEN cohort THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |  CAST(sum(CASE WHEN cohort AND doc_id = keep_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unique
        |FROM k GROUP BY 1, 2 ORDER BY source, lang""".stripMargin,
    "q_quality_filter" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, toks,
        |    round(0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
        |      + 0.2 * (CASE WHEN (CASE WHEN len(toks) > 0 THEN
        |          CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(toks)
        |          ELSE 0.0 END) BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.0 END)
        |      + 0.2 * (CASE WHEN (CASE WHEN length(text) > 0 THEN
        |          CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) / length(text)
        |          ELSE 0.0 END) BETWEEN 0.0 AND 0.2 THEN 1.0 ELSE 0.0 END)
        |      + 0.2 * least((CASE WHEN len(toks) > 0 THEN
        |          CAST(len(list_filter(toks, x -> list_contains(
        |            ['the','a','an','and','of','to','in','is','it','that'], x))) AS DOUBLE)
        |            / len(toks) ELSE 0.0 END) * 5.0, 1.0), 6) AS quality,
        |    len(list_filter(toks, x -> list_contains(['the','and','of','is','that'], x))) AS en,
        |    len(list_filter(toks, x -> list_contains(['el','los','las','es','y'], x))) AS es,
        |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], x))) AS de,
        |    len(list_filter(toks, x -> list_contains(['le','les','est','et','dans'], x))) AS fr,
        |    length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS zh
        |  FROM t
        |)
        |SELECT doc_id,
        |  CASE WHEN len(toks) < 40 THEN 'too_short'
        |       WHEN greatest(en, es, de, fr, zh) = 0 THEN 'wrong_lang'
        |       WHEN quality < 0.5 THEN 'low_quality'
        |       ELSE 'kept' END AS verdict
        |FROM m ORDER BY doc_id""".stripMargin,
    // q_pipeline_curate: the composed funnel — each CTE replays the
    // already-gated stage oracle verbatim (quality rule order, md5
    // content-hash min-id keeper, md5-threshold split, distinct
    // 5-gram sharing), so the composition is bit-exact by stages
    "q_pipeline_curate" ->
      s"""WITH ${SketchOracles.curateBody}
        |SELECT source,
        |  count(*) AS n_raw,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
        |  CAST(sum(CASE WHEN uniq THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  CAST(sum(CASE WHEN uniq AND cohort = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |  CAST(sum(CASE WHEN clean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
        |  CAST(sum(CASE WHEN clean THEN len(toks) ELSE 0 END) AS BIGINT) AS tokens_clean
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    // q_pipeline_full: every stage replays its gated oracle chain
    // over the previous stage's survivor CTE (SketchOracles scaladoc)
    "q_pipeline_full" -> SketchOracles.pipelineFullSql,
    // q_gopher_rules: every ratio is floor(num/den * 1e6) in DOUBLE
    // with the same operand order as the operator, so the micro
    // integers — and therefore the conjunctive verdict — replay
    // bit-exactly
    "q_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> len(x) > 0) AS toks,
        |    list_filter(string_split(text, chr(10)),
        |                l -> len(trim(l)) > 0) AS lines
        |  FROM documents
        |), m AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CASE WHEN len(toks) > 0 THEN CAST(floor(
        |      CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
        |        / CAST(len(toks) AS DOUBLE) * 1000000) AS BIGINT)
        |      ELSE 0 END AS mean_word_micro,
        |    CASE WHEN len(toks) > 0 THEN CAST(floor(CAST(
        |      (length(text) - length(replace(text, '#', '')))
        |      + (length(text) - length(replace(text, '…', '')))
        |      + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE)
        |        / CAST(len(toks) AS DOUBLE) * 1000000) AS BIGINT)
        |      ELSE 0 END AS symbol_micro,
        |    CASE WHEN len(lines) > 0 THEN CAST(floor(CAST(
        |      len(list_filter(lines, l -> starts_with(trim(l), '-')
        |        OR starts_with(trim(l), '*')
        |        OR starts_with(trim(l), '•'))) AS DOUBLE)
        |        / CAST(len(lines) AS DOUBLE) * 1000000) AS BIGINT)
        |      ELSE 0 END AS bullet_micro,
        |    CASE WHEN len(lines) > 0 THEN CAST(floor(CAST(
        |      len(list_filter(lines, l -> ends_with(trim(l), '...')
        |        OR ends_with(trim(l), '…'))) AS DOUBLE)
        |        / CAST(len(lines) AS DOUBLE) * 1000000) AS BIGINT)
        |      ELSE 0 END AS ellipsis_micro,
        |    CASE WHEN len(toks) > 0 THEN CAST(floor(CAST(
        |      len(list_filter(toks, x -> regexp_matches(x, '\p{L}')))
        |        AS DOUBLE)
        |        / CAST(len(toks) AS DOUBLE) * 1000000) AS BIGINT)
        |      ELSE 0 END AS alpha_micro,
        |    CAST(len(list_intersect(toks, ['the','be','to','of','and',
        |      'that','have','with'])) AS BIGINT) AS n_stop_hits
        |  FROM t
        |)
        |SELECT doc_id, n_words, mean_word_micro, symbol_micro,
        |  bullet_micro, ellipsis_micro, alpha_micro, n_stop_hits,
        |  (n_words >= 50 AND n_words <= 100000
        |    AND mean_word_micro >= 3000000 AND mean_word_micro <= 10000000
        |    AND symbol_micro <= 100000
        |    AND bullet_micro <= 900000
        |    AND ellipsis_micro <= 300000
        |    AND alpha_micro >= 800000
        |    AND n_stop_hits >= 2) AS pass
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_token_hist" ->
      """WITH t AS (
        |  SELECT CAST(floor(len(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0)) / 16.0) AS BIGINT) AS bucket
        |  FROM documents
        |)
        |SELECT bucket, bucket * 16 AS lo_tokens, count(*) AS n_docs
        |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,
    // segment chunking mirrors the q_chunk CTE at width 4 / stride 4
    "q_line_dedup" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(0,
        |      CAST(floor((greatest(len(toks), 1) - 1) / 4.0) AS INTEGER)),
        |      i -> struct_pack(chunk_id := i,
        |                       chunk := list_slice(toks, i * 4 + 1, i * 4 + 4))),
        |      recursive := true)
        |  FROM t WHERE len(toks) > 0
        |), s AS (
        |  SELECT doc_id, chunk_id, array_to_string(chunk, ' ') AS seg FROM c
        |), f AS (
        |  SELECT md5(seg) AS seg_md5, count(DISTINCT doc_id) AS seg_df
        |  FROM s GROUP BY 1
        |), j AS (
        |  SELECT s.doc_id, s.chunk_id, s.seg, f.seg_df <= 8 AS kept
        |  FROM s JOIN f ON md5(s.seg) = f.seg_md5
        |)
        |SELECT doc_id, count(*) AS n_seg,
        |  CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
        |  md5(coalesce(
        |    string_agg(seg, ' ' ORDER BY chunk_id) FILTER (WHERE kept), ''))
        |    AS clean_md5
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_mix_weights" ->
      """WITH t AS (
        |  SELECT source, len(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0)) AS n_tok
        |  FROM documents
        |), p AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |    CAST(coalesce(TRY_CAST(substr(source, 4) AS INTEGER), 0) % 4 + 1
        |      AS BIGINT) AS target_q
        |  FROM t GROUP BY source
        |), g AS (
        |  SELECT *, CAST(sum(target_q) OVER () AS BIGINT) AS sum_q FROM p
        |), b AS (
        |  SELECT *, min((n_tokens * sum_q) // target_q) OVER () AS budget FROM g
        |)
        |SELECT source, n_docs, n_tokens, target_q,
        |  (budget * target_q) // sum_q AS planned_tokens,
        |  (((budget * target_q) // sum_q) * 1000000) // n_tokens AS weight_micro
        |FROM b ORDER BY source""".stripMargin,
    "q_temperature_mix" ->
      """WITH t AS (
        |  SELECT source, len(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0)) AS n_tok
        |  FROM documents
        |), p AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |  FROM t GROUP BY source
        |), w AS (
        |  SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w
        |  FROM p
        |), g AS (
        |  SELECT *, CAST(sum(w) OVER () AS BIGINT) AS sum_w,
        |            CAST(sum(n_tokens) OVER () AS BIGINT) AS sum_t
        |  FROM w
        |)
        |SELECT source, n_docs, n_tokens,
        |  (w * 1000000) // sum_w AS weight_micro,
        |  (((w * 1000000) // sum_w) * sum_t) // n_tokens AS rel_natural_micro
        |FROM g ORDER BY source""".stripMargin,
    "q_mix_unimax" ->
      """WITH t AS (
        |  SELECT source, len(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0)) AS n_tok
        |  FROM documents
        |), p AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |    CAST(sum(n_tok) AS BIGINT) AS cap_tokens
        |  FROM t GROUP BY source
        |), o AS (
        |  SELECT *,
        |    CAST(row_number() OVER (ORDER BY cap_tokens, source) - 1 AS BIGINT) AS pos0,
        |    CAST(coalesce(sum(cap_tokens) OVER (ORDER BY cap_tokens, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cap_pre,
        |    CAST(count(*) OVER () AS BIGINT) AS L,
        |    CAST(sum(n_tokens) OVER () AS BIGINT) AS B
        |  FROM p
        |), c AS (
        |  SELECT *, cap_tokens * (L - pos0) < B - cap_pre AS capped FROM o
        |), g AS (
        |  SELECT *,
        |    CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS BIGINT) AS n_capped,
        |    CAST(coalesce(sum(CASE WHEN capped THEN cap_tokens END) OVER (), 0) AS BIGINT) AS capped_tok
        |  FROM c
        |), a AS (
        |  SELECT *, L - n_capped AS slots, B - capped_tok AS lft FROM g
        |)
        |SELECT source, n_docs, n_tokens, cap_tokens,
        |  CASE WHEN capped THEN cap_tokens
        |       ELSE lft // nullif(slots, 0) +
        |            CASE WHEN pos0 >= L - (lft % nullif(slots, 0)) THEN 1 ELSE 0 END
        |  END AS planned_tokens,
        |  coalesce((planned_tokens * 1000000) // nullif(n_tokens, 0), 0)
        |    AS epochs_micro
        |FROM a ORDER BY source""".stripMargin,
    "q_chunk" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(0,
        |      CAST(floor((greatest(len(toks), 1) - 1) / 24.0) AS INTEGER)),
        |      i -> struct_pack(chunk_id := i,
        |                       chunk := list_slice(toks, i * 24 + 1, i * 24 + 32))),
        |      recursive := true)
        |  FROM t WHERE len(toks) > 0
        |)
        |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
        |  array_to_string(chunk, ' ') AS chunk_text,
        |  CAST(len(chunk) AS INTEGER) AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(0,
        |      CAST(floor((greatest(len(toks), 1) - 1) / 24.0) AS INTEGER)),
        |      i -> struct_pack(chunk_id := i,
        |                       chunk := list_slice(toks, i * 24 + 1, i * 24 + 32))),
        |      recursive := true)
        |  FROM t WHERE len(toks) > 0
        |), ch AS (
        |  SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
        |         CAST(len(chunk) AS INTEGER) AS n_chunk_tokens
        |  FROM c
        |), cum AS (
        |  SELECT doc_id % 8 AS bucket, doc_id, chunk_id, n_chunk_tokens,
        |    sum(n_chunk_tokens) OVER (PARTITION BY doc_id % 8
        |      ORDER BY doc_id, chunk_id) AS cum
        |  FROM ch
        |)
        |SELECT bucket, CAST((cum - n_chunk_tokens) // 256 AS BIGINT) AS seq_id,
        |  count(*) AS n_chunks, CAST(sum(n_chunk_tokens) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM cum GROUP BY 1, 2 ORDER BY bucket, seq_id""".stripMargin,
    "q_shard_plan" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(len(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS tokens_before,
        |    CAST(sum(n_tokens) OVER () AS BIGINT) AS total
        |  FROM t
        |)
        |SELECT doc_id, n_tokens,
        |  least((tokens_before * 8) // total, 7) AS shard
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(lower(trim(text)), '\s+'),
        |    t -> len(t) > 0)) AS term
        |  FROM documents
        |), tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    tf.tf * ln(CAST(n_docs AS DOUBLE) / df) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN nd
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term) AS rk
        |  FROM scored
        |)
        |SELECT doc_id, CAST(rk AS INTEGER) AS rk, term,
        |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |  CAST(floor(tfidf * 1000000) AS BIGINT) AS tfidf_micro
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    // the store is an internal layout detail: the oracle recomputes
    // the probe's posting lists straight from the documents — a hash
    // match proves the partitioned-store roundtrip is value-exact
    "q_posting_lookup" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(lower(trim(text)), '\s+'),
        |    t -> len(t) > 0)) AS term
        |  FROM documents
        |), tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1 HAVING count(*) > 1),
        |top5 AS (SELECT term FROM df ORDER BY df DESC, term LIMIT 5)
        |SELECT t.term, t.doc_id, CAST(t.tf AS BIGINT) AS tf
        |FROM tf t JOIN top5 USING (term)
        |ORDER BY term, doc_id""".stripMargin,
    // parenthesization mirrors TextAnalysis.bm25TopK op-for-op: every
    // step is a correctly-rounded IEEE basic op except ln, which the
    // long-green q_tfidf gate shows agrees at micro precision
    "q_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(lower(trim(text)), '\s+'),
        |    t -> len(t) > 0)) AS term
        |  FROM documents
        |), tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |wdl AS (SELECT doc_id, term, tf,
        |  sum(tf) OVER (PARTITION BY doc_id) AS dl FROM tf),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl
        |          FROM (SELECT DISTINCT doc_id, dl FROM wdl)),
        |scored AS (
        |  SELECT w.doc_id, w.term, w.tf, df.df, w.dl,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
        |      (w.tf * (1.2 + 1.0) /
        |       (w.tf + 1.2 * (1.0 - 0.75 + 0.75 * w.dl / avgdl))) AS bm25
        |  FROM wdl w JOIN df USING (term) CROSS JOIN stats
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY bm25 DESC, term) AS rk
        |  FROM scored
        |)
        |SELECT doc_id, CAST(rk AS INTEGER) AS rk, term,
        |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |  CAST(dl AS BIGINT) AS dl,
        |  CAST(floor(bm25 * 1000000) AS BIGINT) AS bm25_micro
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "q_dup_rate" ->
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
        |    AS n_unique,
        |  (count(*) - count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))))
        |    * 1000000 // count(*) AS dup_micro
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash,
        |  min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin,
    // q_substring_dedup: the positional 8-gram hash chain is the same
    // engine-replicated FNV+mix pipeline as the winnow oracle,
    // generalized to width 8 (SketchOracles.shingleFoldN)
    "q_substring_dedup" -> SketchOracles.substringSql,
    // q_substring_cut: same chain + corpus-wide first-occurrence rank;
    // the rebuilt text strings are compared verbatim
    "q_substring_cut" -> SketchOracles.substringCutSql,
    // q_heavy_hitters: sketch certification (the q_approx_distinct
    // pattern) — the Misra–Gries candidate set has no DuckDB
    // counterpart; the gated claims are the exact counts of the
    // guaranteed-frequent set (n·(k+1) > N, k=30) plus the theorem
    // flags the oracle pins TRUE (raw-candidate properties live in
    // HeavyHittersSpec)
    "q_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> len(x) > 0)) AS token
        |  FROM documents
        |), ex AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
        |tot AS (SELECT count(*) AS total FROM tok)
        |SELECT token, n, TRUE AS in_sketch, TRUE AS err_in_bound
        |FROM ex, tot WHERE n * 31 > total
        |ORDER BY n DESC, token""".stripMargin,
    "q_dedup_incremental" ->
      """WITH labeled AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash,
        |    CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cccd' THEN 'train'
        |         ELSE 'eval' END AS cohort
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, content_hash,
        |    row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn,
        |    count(*) OVER (PARTITION BY content_hash) AS n_batch_copies
        |  FROM labeled WHERE cohort = 'eval'
        |)
        |SELECT doc_id, content_hash, n_batch_copies
        |FROM b
        |WHERE rn = 1 AND NOT EXISTS (
        |  SELECT 1 FROM labeled t
        |  WHERE t.cohort = 'train' AND t.content_hash = b.content_hash)
        |ORDER BY doc_id""".stripMargin,
    // q_rsi_wilder oracle: the seed phase (simple average of the first
    // n gains/losses) and the smoothed recurrence, mirroring
    // MarketAnalytics.wilderRsi's arithmetic operation-for-operation.
    "q_rsi_wilder" -> (txnCte.replace("WITH txn", "WITH RECURSIVE txn") + minuteCte +
      rollupCte("day") +
      """, ordered AS (
        |  SELECT symbol, ws, close,
        |    row_number() OVER (PARTITION BY symbol ORDER BY ws) AS rn
        |  FROM roll_c
        |), rec AS (
        |  SELECT symbol, ws, close, rn, close AS prev_close, 0 AS cnt,
        |         0.0::DOUBLE AS g_sum, 0.0::DOUBLE AS l_sum,
        |         0.0::DOUBLE AS avg_g, 0.0::DOUBLE AS avg_l
        |  FROM ordered WHERE rn = 1
        |  UNION ALL
        |  SELECT o.symbol, o.ws, o.close, o.rn, o.close,
        |    r.cnt + 1,
        |    r.g_sum + greatest(o.close - r.prev_close, 0.0),
        |    r.l_sum + greatest(r.prev_close - o.close, 0.0),
        |    CASE WHEN r.cnt + 1 < 14 THEN 0.0
        |         WHEN r.cnt + 1 = 14
        |           THEN (r.g_sum + greatest(o.close - r.prev_close, 0.0)) / 14
        |         ELSE (r.avg_g * 13 + greatest(o.close - r.prev_close, 0.0)) / 14 END,
        |    CASE WHEN r.cnt + 1 < 14 THEN 0.0
        |         WHEN r.cnt + 1 = 14
        |           THEN (r.l_sum + greatest(r.prev_close - o.close, 0.0)) / 14
        |         ELSE (r.avg_l * 13 + greatest(r.prev_close - o.close, 0.0)) / 14 END
        |  FROM rec r JOIN ordered o ON o.symbol = r.symbol AND o.rn = r.rn + 1
        |)
        |SELECT symbol, strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, close,
        |  CASE WHEN cnt < 14 THEN NULL
        |       WHEN avg_l = 0.0 THEN 100.0
        |       ELSE 100.0 - 100.0 / (1.0 + avg_g / avg_l) END AS rsi_wilder
        |FROM rec ORDER BY symbol, window_start""".stripMargin),
    // q_macd oracle: both close-EMAs and the signal-EMA carried through
    // one recursive pass; seeds are close (EMAs) and the first macd
    // value (signal), exactly as three MarketAnalytics.ema runs seed.
    "q_macd" -> (txnCte.replace("WITH txn", "WITH RECURSIVE txn") + minuteCte +
      rollupCte("day") +
      """, ordered AS (
        |  SELECT symbol, ws, close,
        |    row_number() OVER (PARTITION BY symbol ORDER BY ws) AS rn
        |  FROM roll_c
        |), rec AS (
        |  SELECT symbol, ws, close, rn,
        |         close AS e_fast, close AS e_slow, 0.0::DOUBLE AS sig
        |  FROM ordered WHERE rn = 1
        |  UNION ALL
        |  SELECT o.symbol, o.ws, o.close, o.rn,
        |    (2.0 / 13.0) * o.close + (1.0 - (2.0 / 13.0)) * r.e_fast,
        |    (2.0 / 27.0) * o.close + (1.0 - (2.0 / 27.0)) * r.e_slow,
        |    (2.0 / 10.0) * (((2.0 / 13.0) * o.close + (1.0 - (2.0 / 13.0)) * r.e_fast)
        |                  - ((2.0 / 27.0) * o.close + (1.0 - (2.0 / 27.0)) * r.e_slow))
        |      + (1.0 - (2.0 / 10.0)) * r.sig
        |  FROM rec r JOIN ordered o ON o.symbol = r.symbol AND o.rn = r.rn + 1
        |)
        |SELECT symbol, strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, close,
        |  e_fast - e_slow AS macd, sig AS macd_signal,
        |  (e_fast - e_slow) - sig AS macd_hist
        |FROM rec ORDER BY symbol, window_start""".stripMargin),
    // q_stochastic oracle: the same pinned-order arithmetic — %D is the
    // explicit (k + lag1 + lag2) / 3, not an avg() window.
    "q_stochastic" -> (txnCte + minuteCte + rollupCte("day") +
      """, k AS (
        |  SELECT symbol, ws,
        |    CASE WHEN max(high) OVER w = min(low) OVER w THEN 50.0
        |         ELSE (close - min(low) OVER w)
        |              / (max(high) OVER w - min(low) OVER w) * 100.0 END AS pct_k
        |  FROM roll_c
        |  WINDOW w AS (PARTITION BY symbol ORDER BY ws
        |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |), d AS (
        |  SELECT symbol, ws, pct_k,
        |    (pct_k + lag(pct_k, 1) OVER v + lag(pct_k, 2) OVER v) / 3.0 AS pct_d
        |  FROM k
        |  WINDOW v AS (PARTITION BY symbol ORDER BY ws)
        |)
        |SELECT symbol, strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  CAST(floor(pct_k * 1000000) AS BIGINT) AS pct_k_micro,
        |  CAST(floor(pct_d * 1000000) AS BIGINT) AS pct_d_micro
        |FROM d ORDER BY symbol, window_start""".stripMargin),
    // q_atr oracle: TR and the Wilder smoothing carried through a
    // recursive CTE, arithmetic mirrored operation-for-operation.
    "q_atr" -> (txnCte.replace("WITH txn", "WITH RECURSIVE txn") + minuteCte +
      rollupCte("day") +
      """, ordered AS (
        |  SELECT symbol, ws, high, low, close,
        |    row_number() OVER (PARTITION BY symbol ORDER BY ws) AS rn
        |  FROM roll_c
        |), rec AS (
        |  SELECT symbol, ws, close, rn, 1 AS cnt,
        |         high - low AS tr_sum, 0.0::DOUBLE AS atr
        |  FROM ordered WHERE rn = 1
        |  UNION ALL
        |  SELECT o.symbol, o.ws, o.close, o.rn, r.cnt + 1,
        |    r.tr_sum + greatest(o.high - o.low,
        |      abs(o.high - r.close), abs(o.low - r.close)),
        |    CASE WHEN r.cnt + 1 < 14 THEN 0.0
        |         WHEN r.cnt + 1 = 14
        |           THEN (r.tr_sum + greatest(o.high - o.low,
        |                  abs(o.high - r.close), abs(o.low - r.close))) / 14
        |         ELSE (r.atr * 13 + greatest(o.high - o.low,
        |                abs(o.high - r.close), abs(o.low - r.close))) / 14 END
        |  FROM rec r JOIN ordered o ON o.symbol = r.symbol AND o.rn = r.rn + 1
        |)
        |SELECT symbol, strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, close,
        |  CASE WHEN cnt < 14 THEN NULL ELSE atr END AS atr
        |FROM rec ORDER BY symbol, window_start""".stripMargin),
    "q_obv" -> (txnCte + minuteCte + rollupCte("day") +
      """, s AS (
        |  SELECT symbol, ws, close, volume,
        |    CASE WHEN close - lag(close, 1) OVER v > 0 THEN volume
        |         WHEN close - lag(close, 1) OVER v < 0 THEN -volume
        |         ELSE 0 END AS sv
        |  FROM roll_c
        |  WINDOW v AS (PARTITION BY symbol ORDER BY ws)
        |)
        |SELECT symbol, strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  close, volume,
        |  CAST(sum(sv) OVER (PARTITION BY symbol ORDER BY ws
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
        |FROM s ORDER BY symbol, window_start""".stripMargin),
    // q_fingerprint oracle: FNV-1a 64-bit with wraparound arithmetic —
    // HUGEINT products (≤2^104) reduced mod 2^64 each step, then
    // mapped to the signed BIGINT Spark emits.
    "q_fingerprint" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
        |            THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT)
        |    AS fingerprint
        |FROM (
        |  SELECT doc_id, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |      list_transform(generate_series(1, octet_length(encode(text))),
        |        i -> CAST(CAST('0x' || substr(hex(encode(text)), 2*i-1, 2) AS INTEGER) AS HUGEINT))),
        |    (acc, b) -> (xor(acc, b) * 1099511628211) % 18446744073709551616::HUGEINT
        |  ) AS h
        |  FROM documents
        |) ORDER BY doc_id""".stripMargin,
    // q_approx_distinct: the raw HLL estimate has no DuckDB
    // counterpart (different sketch) — the gated claim is exact
    // cardinalities + the in-bound flags, which the oracle pins TRUE
    // (raw-estimate properties covered by ApproxSpec).
    "q_approx_distinct" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users, TRUE AS users_in_bound,
        |  count(DISTINCT props) AS exact_props, TRUE AS props_in_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q_dedup_minhash / q_dedup_simhash / q_ann_lsh / q_ann_ivf: the
    // signature/index chains are reproduced exactly in DuckDB
    // (SketchOracles scaladocs).
    "q_dedup_minhash" -> SketchOracles.minhashSql,
    // the streaming path must reproduce the batch candidate chain
    // exactly (no bucket overflows at this corpus), so it shares its
    // full-recompute oracle
    "q_stream_neardup" -> SketchOracles.minhashSql,
    "q_dedup_minhash_incr" -> SketchOracles.minhashIncrSql,
    "q_dedup_health" -> SketchOracles.dedupHealthSql,
    "q_minhash_est" -> SketchOracles.minhashEstSql,
    "q_dedup_simhash" -> SketchOracles.simhashSql,
    // q_dedup_capped_recall: composed exact-dedup → simhash recall
    // gate; all-pairs ground truth over the content-hash keepers
    "q_dedup_capped_recall" -> SketchOracles.simhashComposedSql,
    // same all-pairs ground truth: the cap is not binding at verify
    // SFs, so the capped plan must reproduce the exact answer
    "q_dedup_simhash_capped" -> SketchOracles.simhashSql,
    // same all-pairs hamming ground truth, candidate-pair projection:
    // at sf0.01 the size gate selects the simhash family
    "q_dedup_neardup_auto" ->
      s"""SELECT doc_a, doc_b FROM (${SketchOracles.simhashSql}) t
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q_ann_lsh" -> SketchOracles.annLshSql,
    "q_ann_ivf" -> SketchOracles.annIvfSql,
    // store-backed probe must be value-exact vs the inline build
    "q_ann_ivf_store" -> SketchOracles.annIvfSql,
    "q_kmeans" ->
      (kmeansCte + "\nSELECT vec_id, cluster FROM af ORDER BY vec_id"),
    "q_kmeans_quality" ->
      (kmeansCte +
        """
          |SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
          |       CAST(sum(dist) AS BIGINT) AS inertia_q
          |FROM af GROUP BY cluster ORDER BY cluster""".stripMargin),
    // same Lloyd replay, then the q_semdedup within-cell sweep over
    // the ORIGINAL double embeddings (list_cosine_similarity ≡ the
    // native CosineSimF double accumulation)
    "q_semdedup_kmeans" ->
      (kmeansCte +
        """
          |, emb AS (
          |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
          |), idx AS (
          |  SELECT af.vec_id, af.cluster, emb.e FROM af JOIN emb USING (vec_id)
          |), p AS (
          |  SELECT a.vec_id, max(list_cosine_similarity(a.e, b.e)) AS mp
          |  FROM idx a JOIN idx b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
          |  GROUP BY a.vec_id
          |)
          |SELECT i.vec_id, i.cluster,
          |  CAST(coalesce(floor(p.mp * 1000000), -1) AS BIGINT) AS max_prior_sim_micro,
          |  coalesce(p.mp <= 0.35, TRUE) AS kept
          |FROM idx i LEFT JOIN p USING (vec_id)
          |ORDER BY i.vec_id""".stripMargin),
    // 1:1 replica of the quantized-ANN chain: per-dim max-abs scales,
    // clamp(floor(v*s)) int8 vectors, integer coarse dot top-50,
    // exact cosine re-rank top-10 (floor is engine-portable, integer
    // coarse scores make the candidate cut deterministic)
    "q_ann_int8" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        |), dims AS (
        |  SELECT i, max(abs(emb[i])) AS ma
        |  FROM e, (SELECT unnest(generate_series(1,
        |    (SELECT max(len(emb)) FROM e))) AS i) ix
        |  GROUP BY i
        |), sc AS (
        |  SELECT list(CASE WHEN ma = 0 THEN 0.0 ELSE 127.0 / ma END
        |              ORDER BY i) AS s
        |  FROM dims
        |), qv AS (
        |  SELECT vec_id, list_transform(generate_series(1, len(emb)),
        |    i -> CAST(greatest(-127, least(127, floor(emb[i] * s[i])))
        |         AS BIGINT)) AS q
        |  FROM e, sc
        |), qq AS (
        |  SELECT vec_id AS query_id, q AS qx FROM qv WHERE vec_id < 3
        |), co AS (
        |  SELECT qq.query_id, v.vec_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(v.q)),
        |      i -> v.q[i] * qq.qx[i])) AS BIGINT) AS qdot
        |  FROM qv v, qq
        |), cr AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY qdot DESC, vec_id) AS crk
        |  FROM co
        |), cand AS (
        |  SELECT query_id, vec_id FROM cr WHERE crk <= 50
        |), re AS (
        |  SELECT c.query_id, c.vec_id,
        |    list_cosine_similarity(ev.emb, eq.emb) AS sim
        |  FROM cand c
        |  JOIN e ev ON ev.vec_id = c.vec_id
        |  JOIN e eq ON eq.vec_id = c.query_id
        |), r AS (
        |  SELECT query_id, vec_id, sim,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, vec_id) AS rank
        |  FROM re
        |)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id,
        |  CAST(floor(sim * 1000000) AS BIGINT) AS sim_micro
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // binary ANN: the coarse stage's packed-sign-bit hamming equals
    // the count of per-dimension sign disagreements, which is how the
    // oracle states it (no packing needed on the SQL side)
    "q_ann_binary" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        |), q AS (
        |  SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < 3
        |), co AS (
        |  SELECT q.query_id, v.vec_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(v.emb)),
        |      i -> CASE WHEN (v.emb[i] > 0) <> (q.qe[i] > 0)
        |           THEN 1 ELSE 0 END)) AS BIGINT) AS hd
        |  FROM e v, q
        |), cr AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY hd ASC, vec_id) AS crk
        |  FROM co
        |), cand AS (
        |  SELECT query_id, vec_id FROM cr WHERE crk <= 50
        |), re AS (
        |  SELECT c.query_id, c.vec_id,
        |    list_cosine_similarity(ev.emb, eq.emb) AS sim
        |  FROM cand c
        |  JOIN e ev ON ev.vec_id = c.vec_id
        |  JOIN e eq ON eq.vec_id = c.query_id
        |), r AS (
        |  SELECT query_id, vec_id, sim,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, vec_id) AS rank
        |  FROM re
        |)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id,
        |  CAST(floor(sim * 1000000) AS BIGINT) AS sim_micro
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // asymmetric binary ANN: coarse score = Σ (corpus sign ? +m : -m)
    // with m = floor(query_d·1e6) — a BIGINT sum, so the replica is
    // order-independent and exact
    "q_ann_binary_asym" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        |), q AS (
        |  SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < 3
        |), co AS (
        |  SELECT q.query_id, v.vec_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(v.emb)),
        |      i -> CASE WHEN v.emb[i] > 0
        |           THEN CAST(floor(q.qe[i] * 1000000) AS BIGINT)
        |           ELSE -CAST(floor(q.qe[i] * 1000000) AS BIGINT) END))
        |      AS BIGINT) AS sd
        |  FROM e v, q
        |), cr AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sd DESC, vec_id) AS crk
        |  FROM co
        |), cand AS (
        |  SELECT query_id, vec_id FROM cr WHERE crk <= 50
        |), re AS (
        |  SELECT c.query_id, c.vec_id,
        |    list_cosine_similarity(ev.emb, eq.emb) AS sim
        |  FROM cand c
        |  JOIN e ev ON ev.vec_id = c.vec_id
        |  JOIN e eq ON eq.vec_id = c.query_id
        |), r AS (
        |  SELECT query_id, vec_id, sim,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, vec_id) AS rank
        |  FROM re
        |)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id,
        |  CAST(floor(sim * 1000000) AS BIGINT) AS sim_micro
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // drift replica: per-(cohort, dim) BIGINT micro-sums; the max
    // per-dimension gap is cross-multiplied in HUGEINT (DECIMAL(38,0)
    // engine-side) and the centroid cosine is restated as the
    // integer-exact sign(dot)*floor(dot^2*1e12/(naq*nbq)) over
    // 13-bit-rescaled sums — NO floating point survives the initial
    // floor(v*1e6), so no list_cosine_similarity / cast-chain /
    // DuckDB-version sensitivity anywhere in the readout. pmod-style
    // ((x%2)+2)%2 keeps negative vec_ids in-domain like the engine's
    // pmod; the non-negative-remainder floor-div trick makes // and
    // DIV agree on negative sums.
    "q_embed_drift" -> driftSql,
    "q_stream_drift" -> driftSql,
    "q_embed_drift_incr" -> driftSql,
    // scalar drift replicas: same micro-quantize / fixed-width-bucket
    // / cross-multiplied-count arithmetic as the engine, HUGEINT all
    // the way, every aggregate output CAST to BIGINT (the dtype-strict
    // convention — NOTES_r15 §3)
    "q_value_drift" ->
      """WITH e AS (
        |  SELECT CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |              THEN 0 ELSE 1 END AS cohort,
        |         CAST(floor(value * 1000000) AS BIGINT) AS m
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        |), b AS (
        |  SELECT min(m) AS mn, max(m) AS mx FROM e
        |), h AS (
        |  SELECT (m - mn) // ((mx - mn) // 32 + 1) AS bucket,
        |         CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS c_a,
        |         CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS c_b
        |  FROM e, b GROUP BY 1
        |), n AS (
        |  SELECT CAST(coalesce(sum(c_a), 0) AS BIGINT) AS n_a,
        |         CAST(coalesce(sum(c_b), 0) AS BIGINT) AS n_b
        |  FROM h
        |), t AS (
        |  SELECT coalesce(sum(abs(CAST(c_a AS HUGEINT) * n_b
        |           - CAST(c_b AS HUGEINT) * n_a)), 0) AS tv_num
        |  FROM h, n
        |), c AS (
        |  SELECT x.bucket, sum(y.c_a) AS ca_cum, sum(y.c_b) AS cb_cum
        |  FROM h x JOIN h y ON y.bucket <= x.bucket GROUP BY 1
        |), k AS (
        |  SELECT coalesce(max(abs(CAST(ca_cum AS HUGEINT) * n_b
        |           - CAST(cb_cum AS HUGEINT) * n_a)), 0) AS ks_num
        |  FROM c, n
        |)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
        |       ELSE CAST((tv_num * 1000000000000)
        |         // (2 * CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
        |  END AS tv_e12,
        |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
        |       ELSE CAST((ks_num * 1000000000000)
        |         // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
        |  END AS ks_e12
        |FROM n, t, k""".stripMargin,
    "q_value_drift_seg" ->
      """WITH e AS (
        |  SELECT event_type AS segment,
        |         CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |              THEN 0 ELSE 1 END AS cohort,
        |         CAST(floor(value * 1000000) AS BIGINT) AS m
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        |), b AS (
        |  SELECT min(m) AS mn, max(m) AS mx FROM e
        |), h AS (
        |  SELECT segment, (m - mn) // ((mx - mn) // 32 + 1) AS bucket,
        |         CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS c_a,
        |         CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS c_b
        |  FROM e, b GROUP BY 1, 2
        |), n AS (
        |  SELECT segment, CAST(sum(c_a) AS BIGINT) AS n_a,
        |         CAST(sum(c_b) AS BIGINT) AS n_b
        |  FROM h GROUP BY 1
        |), t AS (
        |  SELECT h.segment, n_a, n_b,
        |         sum(abs(CAST(c_a AS HUGEINT) * n_b
        |           - CAST(c_b AS HUGEINT) * n_a)) AS tv_num
        |  FROM h JOIN n ON h.segment = n.segment
        |  WHERE n_a > 0 AND n_b > 0
        |  GROUP BY 1, 2, 3
        |)
        |SELECT segment, n_a, n_b,
        |  CAST((tv_num * 1000000000000)
        |    // (2 * CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS tv_e12
        |FROM t
        |ORDER BY tv_e12 DESC, segment LIMIT 5""".stripMargin,
    // per-dimension diagnosis replica: same micro-sum CTEs as the
    // screen, HUGEINT cross products, top-k by exact gap. pos is
    // 0-based engine-side; DuckDB's generate_series index i is
    // 1-based, hence i-1.
    "q_embed_drift_dims" ->
      """WITH e AS (
        |  SELECT CAST(((vec_id % 2) + 2) % 2 AS INTEGER) AS cohort,
        |         embedding::DOUBLE[] AS emb
        |  FROM embeddings
        |), n AS (
        |  SELECT
        |    coalesce(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END), 0) AS n_a,
        |    coalesce(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END), 0) AS n_b
        |  FROM e
        |), d AS (
        |  SELECT i,
        |    sum(CASE WHEN cohort = 0 THEN
        |      CASE WHEN emb[i] IS NULL OR isnan(emb[i]) THEN 0
        |           ELSE CAST(floor(emb[i] * 1000000) AS BIGINT) END
        |      ELSE 0 END) AS s_a,
        |    sum(CASE WHEN cohort = 1 THEN
        |      CASE WHEN emb[i] IS NULL OR isnan(emb[i]) THEN 0
        |           ELSE CAST(floor(emb[i] * 1000000) AS BIGINT) END
        |      ELSE 0 END) AS s_b
        |  FROM e, (SELECT unnest(generate_series(1,
        |    (SELECT max(len(emb)) FROM e))) AS i) ix
        |  WHERE i <= len(emb)
        |  GROUP BY i
        |)
        |SELECT CAST(i - 1 AS INTEGER) AS pos,
        |  CAST(s_a AS BIGINT) AS s_a, CAST(s_b AS BIGINT) AS s_b,
        |  CAST(abs(CAST(s_a AS HUGEINT) * n_b
        |         - CAST(s_b AS HUGEINT) * n_a) AS BIGINT) AS cross_diff
        |FROM d, n
        |ORDER BY cross_diff DESC, pos LIMIT 10""".stripMargin,
    // centroid direction = per-dimension exact BIGINT sums of
    // floor(v*1e6), then the same double→float→double cast chain the
    // engine's array<float> cosine kernel sees — integer summation
    // keeps the centroid order-independent, so both engines score
    // identically
    "q_embed_outlier" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
        |), d AS (
        |  SELECT i, sum(CAST(floor(emb[i] * 1000000) AS BIGINT)) AS s
        |  FROM e, (SELECT unnest(generate_series(1,
        |    (SELECT max(len(emb)) FROM e))) AS i) ix
        |  GROUP BY i
        |), ctr AS (
        |  SELECT list(CAST(CAST(CAST(s AS DOUBLE) AS FLOAT) AS DOUBLE)
        |              ORDER BY i) AS c
        |  FROM d
        |), sc AS (
        |  SELECT e.vec_id, e.label,
        |    list_cosine_similarity(e.emb, ctr.c) AS sim
        |  FROM e, ctr
        |), r AS (
        |  SELECT vec_id, label, sim,
        |    row_number() OVER (ORDER BY sim ASC, vec_id) AS rank
        |  FROM sc
        |)
        |SELECT CAST(rank AS INTEGER) AS rank, vec_id, label,
        |  CAST(floor(sim * 1000000) AS BIGINT) AS sim_micro
        |FROM r WHERE rank <= 40 ORDER BY rank""".stripMargin,
    // 1:1 replica of the product-quantization chain: int8 quantize
    // (same sc/qv CTEs as q_ann_int8), md5-ordered 16-vector
    // codebook split into 8 subspaces of 8 dims, all-integer L2
    // code assignment (ties -> smallest code), integer ADC LUT-sum
    // coarse top-50, exact cosine re-rank top-10
    "q_ann_pq" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        |), dims AS (
        |  SELECT i, max(abs(emb[i])) AS ma
        |  FROM e, (SELECT unnest(generate_series(1,
        |    (SELECT max(len(emb)) FROM e))) AS i) ix
        |  GROUP BY i
        |), sc AS (
        |  SELECT list(CASE WHEN ma = 0 THEN 0.0 ELSE 127.0 / ma END
        |              ORDER BY i) AS s
        |  FROM dims
        |), qv AS (
        |  SELECT vec_id, list_transform(generate_series(1, len(emb)),
        |    i -> CAST(greatest(-127, least(127, floor(emb[i] * s[i])))
        |         AS BIGINT)) AS q
        |  FROM e, sc
        |), pick AS (
        |  SELECT vec_id AS code_id, q FROM qv
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
        |), cb AS (
        |  SELECT ms.m, code_id,
        |    list_slice(q, ms.m * 8 + 1, ms.m * 8 + 8) AS cent
        |  FROM pick, (SELECT unnest(generate_series(0, 7)) AS m) ms
        |), subs AS (
        |  SELECT vec_id, ms.m,
        |    list_slice(q, ms.m * 8 + 1, ms.m * 8 + 8) AS sub
        |  FROM qv, (SELECT unnest(generate_series(0, 7)) AS m) ms
        |), encd AS (
        |  SELECT vec_id, m, code_id AS code FROM (
        |    SELECT s.vec_id, s.m, cb.code_id,
        |      row_number() OVER (PARTITION BY s.vec_id, s.m
        |        ORDER BY list_sum(list_transform(generate_series(1, 8),
        |          i -> (s.sub[i] - cb.cent[i]) * (s.sub[i] - cb.cent[i]))),
        |          cb.code_id) AS rn
        |    FROM subs s JOIN cb ON cb.m = s.m)
        |  WHERE rn = 1
        |), lut AS (
        |  SELECT qs.vec_id AS query_id, qs.m, cb.code_id,
        |    CAST(list_sum(list_transform(generate_series(1, 8),
        |      i -> qs.sub[i] * cb.cent[i])) AS BIGINT) AS qdot
        |  FROM subs qs JOIN cb ON cb.m = qs.m
        |  WHERE qs.vec_id < 3
        |), adc AS (
        |  SELECT l.query_id, en.vec_id, CAST(sum(l.qdot) AS BIGINT) AS adc
        |  FROM encd en JOIN lut l ON l.m = en.m AND l.code_id = en.code
        |  GROUP BY 1, 2
        |), cr AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY adc DESC, vec_id) AS crk
        |  FROM adc
        |), cand AS (
        |  SELECT query_id, vec_id FROM cr WHERE crk <= 50
        |), re AS (
        |  SELECT c.query_id, c.vec_id,
        |    list_cosine_similarity(ev.emb, eq.emb) AS sim
        |  FROM cand c
        |  JOIN e ev ON ev.vec_id = c.vec_id
        |  JOIN e eq ON eq.vec_id = c.query_id
        |), r AS (
        |  SELECT query_id, vec_id, sim,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, vec_id) AS rank
        |  FROM re
        |)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id,
        |  CAST(floor(sim * 1000000) AS BIGINT) AS sim_micro
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // q_ann_ivfpq: composes annIvfSql's cent/cellof/probes replay
    // with q_ann_pq's quantize/codebook/encode/LUT replay — the ADC
    // scan is restricted to the probed cells' vectors, exactly the
    // operator's codes⋈probes join
    "q_ann_ivfpq" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        |), cent AS (
        |  SELECT vec_id AS cell_id, emb AS c FROM e
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
        |), asg AS (
        |  SELECT vec_id, cell_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY list_cosine_similarity(emb, c) DESC, cell_id) AS rn
        |  FROM e CROSS JOIN cent
        |), cellof AS (
        |  SELECT vec_id, cell_id FROM asg WHERE rn = 1
        |), probes AS (
        |  SELECT query_id, cell_id FROM (
        |    SELECT q.vec_id AS query_id, cent.cell_id,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(q.emb, cent.c) DESC, cent.cell_id) AS rn
        |    FROM e q CROSS JOIN cent WHERE q.vec_id < 3)
        |  WHERE rn <= 4
        |), dims AS (
        |  SELECT i, max(abs(emb[i])) AS ma
        |  FROM e, (SELECT unnest(generate_series(1,
        |    (SELECT max(len(emb)) FROM e))) AS i) ix
        |  GROUP BY i
        |), sc AS (
        |  SELECT list(CASE WHEN ma = 0 THEN 0.0 ELSE 127.0 / ma END
        |              ORDER BY i) AS s
        |  FROM dims
        |), qv AS (
        |  SELECT vec_id, list_transform(generate_series(1, len(emb)),
        |    i -> CAST(greatest(-127, least(127, floor(emb[i] * s[i])))
        |         AS BIGINT)) AS q
        |  FROM e, sc
        |), pick AS (
        |  SELECT vec_id AS code_id, q FROM qv
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
        |), cb AS (
        |  SELECT ms.m, code_id,
        |    list_slice(q, ms.m * 8 + 1, ms.m * 8 + 8) AS cent
        |  FROM pick, (SELECT unnest(generate_series(0, 7)) AS m) ms
        |), subs AS (
        |  SELECT vec_id, ms.m,
        |    list_slice(q, ms.m * 8 + 1, ms.m * 8 + 8) AS sub
        |  FROM qv, (SELECT unnest(generate_series(0, 7)) AS m) ms
        |), encd AS (
        |  SELECT vec_id, m, code_id AS code FROM (
        |    SELECT s.vec_id, s.m, cb.code_id,
        |      row_number() OVER (PARTITION BY s.vec_id, s.m
        |        ORDER BY list_sum(list_transform(generate_series(1, 8),
        |          i -> (s.sub[i] - cb.cent[i]) * (s.sub[i] - cb.cent[i]))),
        |          cb.code_id) AS rn
        |    FROM subs s JOIN cb ON cb.m = s.m)
        |  WHERE rn = 1
        |), lut AS (
        |  SELECT qs.vec_id AS query_id, qs.m, cb.code_id,
        |    CAST(list_sum(list_transform(generate_series(1, 8),
        |      i -> qs.sub[i] * cb.cent[i])) AS BIGINT) AS qdot
        |  FROM subs qs JOIN cb ON cb.m = qs.m
        |  WHERE qs.vec_id < 3
        |), adc AS (
        |  SELECT l.query_id, en.vec_id, CAST(sum(l.qdot) AS BIGINT) AS adc
        |  FROM encd en
        |  JOIN cellof co ON co.vec_id = en.vec_id
        |  JOIN probes p ON p.cell_id = co.cell_id
        |  JOIN lut l ON l.m = en.m AND l.code_id = en.code
        |             AND l.query_id = p.query_id
        |  GROUP BY 1, 2
        |), cr AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY adc DESC, vec_id) AS crk
        |  FROM adc
        |), cand AS (
        |  SELECT query_id, vec_id FROM cr WHERE crk <= 50
        |), re AS (
        |  SELECT c.query_id, c.vec_id,
        |    list_cosine_similarity(ev.emb, eq.emb) AS sim
        |  FROM cand c
        |  JOIN e ev ON ev.vec_id = c.vec_id
        |  JOIN e eq ON eq.vec_id = c.query_id
        |), r AS (
        |  SELECT query_id, vec_id, sim,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, vec_id) AS rank
        |  FROM re
        |)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id,
        |  CAST(floor(sim * 1000000) AS BIGINT) AS sim_micro
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // Shared DuckDB shingle-set pipeline: tokenization mirrors
    // TextAnalysis.tokens (split lower(trim) on \s+, drop empties),
    // 3-gram string shingles stand in for the Spark side's 64-bit
    // shingle hashes (Jaccard only sees set cardinalities, which agree
    // unless the FNV token hash collides within a doc pair — ~2^-64).
    "q_source_overlap" ->
      """WITH toks AS (
        |  SELECT source, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |    t -> len(t) > 0) AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT source, unnest(list_distinct(
        |    list_transform(generate_series(1, len(tk) - 2),
        |      i -> array_to_string(list_slice(tk, i, i + 2), ' ')))) AS g
        |  FROM toks WHERE len(tk) >= 3
        |), sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
        |inter AS (
        |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_int
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT source_a, source_b, n_int,
        |  sa.n + sb.n - n_int AS n_union,
        |  (n_int * 1000000) // (sa.n + sb.n - n_int) AS jaccard_micro
        |FROM inter
        |JOIN sizes sa ON sa.source = source_a
        |JOIN sizes sb ON sb.source = source_b
        |ORDER BY source_a, source_b""".stripMargin,
    "q_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |    t -> len(t) > 0) AS tk
        |  FROM documents
        |), shset AS (
        |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |    i -> array_to_string(list_slice(tk, i, i + 2), ' '))) AS sh
        |  FROM toks WHERE len(tk) >= 3
        |), ex AS (SELECT doc_id, unnest(sh) AS s FROM shset),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shset),
        |pair_int AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_int
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b,
        |  CAST(floor(CAST(n_int AS DOUBLE) / (sa.n_sh + sb.n_sh - n_int) * 1000000)
        |    AS BIGINT) AS jaccard_micro
        |FROM pair_int
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE CAST(n_int AS DOUBLE) / (sa.n_sh + sb.n_sh - n_int) >= 0.2
        |ORDER BY doc_a, doc_b""".stripMargin,
    // q_containment: all-ordered-pairs ground truth — the Spark side's
    // prefix-probe/full-index join must reproduce exact asymmetric
    // containment |sh(a)∩sh(b)|/|sh(a)| at any size ratio
    "q_containment" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |    t -> len(t) > 0) AS tk
        |  FROM documents
        |), shset AS (
        |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |    i -> array_to_string(list_slice(tk, i, i + 2), ' '))) AS sh
        |  FROM toks WHERE len(tk) >= 3
        |), ex AS (SELECT doc_id, unnest(sh) AS s FROM shset),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shset),
        |pair_int AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_int
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b,
        |  CAST(floor(CAST(n_int AS DOUBLE) / sa.n_sh * 1000000) AS BIGINT)
        |    AS containment_micro
        |FROM pair_int
        |JOIN sizes sa ON sa.doc_id = doc_a
        |WHERE CAST(n_int AS DOUBLE) / sa.n_sh >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    // q_containment_scale / q_containment_recall: the df-capped
    // prefix-probe miner's output depends on the rarest-first (df,
    // signed hash) order and the cap, so the oracle replicates the
    // FNV shingle chain (SketchOracles) rather than string grams
    "q_containment_scale" -> SketchOracles.containmentCappedSql,
    "q_containment_recall" -> SketchOracles.containmentRecallSql,
    "q_dsir" -> SketchOracles.dsirSql,
    // the incremental store fold must equal the full recompute over
    // the whole corpus, so it shares the same oracle verbatim (the
    // q_dedup_cluster_incr precedent)
    "q_dsir_incr" -> SketchOracles.dsirSql,
    "q_dedup_cluster" -> SketchOracles.clusterCcSql,
    // the incremental assignment-merge must equal the full recompute
    // over the whole corpus, so it shares the same oracle verbatim
    "q_dedup_cluster_incr" -> SketchOracles.clusterCcSql,
    // q_dedup_corpus: the q_dedup_cluster reachability machinery
    // restricted to exact-dedup keepers, then survivors = keepers that
    // are their own cluster representative (or in no cluster at all)
    "q_dedup_corpus" ->
      """WITH RECURSIVE hx AS (
        |  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
        |  FROM documents
        |), keep AS (
        |  SELECT min(doc_id) AS doc_id FROM hx GROUP BY h
        |), toks AS (
        |  SELECT d.doc_id, list_filter(regexp_split_to_array(lower(trim(d.text)), '\s+'),
        |    t -> len(t) > 0) AS tk
        |  FROM documents d JOIN keep k ON d.doc_id = k.doc_id
        |), shset AS (
        |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |    i -> array_to_string(list_slice(tk, i, i + 2), ' '))) AS sh
        |  FROM toks WHERE len(tk) >= 3
        |), ex AS (SELECT doc_id, unnest(sh) AS s FROM shset),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shset),
        |pair_int AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_int
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM pair_int
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE CAST(n_int AS DOUBLE) / (sa.n_sh + sb.n_sh - n_int) >= 0.8
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs
        |), reach AS (
        |  SELECT DISTINCT src AS doc_id, src AS lbl FROM edges
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.doc_id
        |), lbl AS (
        |  SELECT doc_id, min(lbl) AS cluster_id FROM reach GROUP BY doc_id
        |)
        |SELECT k.doc_id FROM keep k
        |WHERE NOT EXISTS (SELECT 1 FROM lbl
        |                  WHERE lbl.doc_id = k.doc_id AND lbl.cluster_id <> k.doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_embed_neardup" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  CAST(floor(list_cosine_similarity(a.embedding::DOUBLE[],
        |    b.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS sim_micro
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.45
        |ORDER BY vec_a, vec_b""".stripMargin,
    // q_semdedup: the cent/asg CTEs mirror annIvfSql's (same md5 pick,
    // same sim-desc/cell-asc argmax tie-break); max over bit-identical
    // cosines picks the same value in both engines
    "q_semdedup" ->
      """WITH c0 AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
        |), cent AS (
        |  SELECT vec_id AS cell_id, e AS c FROM c0
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
        |), asg AS (
        |  SELECT vec_id, e, cell_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY list_cosine_similarity(e, c) DESC, cell_id) AS rn
        |  FROM c0 CROSS JOIN cent
        |), idx AS (
        |  SELECT vec_id, e, cell_id FROM asg WHERE rn = 1
        |), p AS (
        |  SELECT a.vec_id, max(list_cosine_similarity(a.e, b.e)) AS mp
        |  FROM idx a JOIN idx b ON a.cell_id = b.cell_id AND b.vec_id < a.vec_id
        |  GROUP BY a.vec_id
        |)
        |SELECT i.vec_id, i.cell_id,
        |  CAST(coalesce(floor(p.mp * 1000000), -1) AS BIGINT) AS max_prior_sim_micro,
        |  coalesce(p.mp <= 0.35, TRUE) AS kept
        |FROM idx i LEFT JOIN p USING (vec_id)
        |ORDER BY i.vec_id""".stripMargin,
    "q_knn_brute" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
        |  FROM embeddings WHERE vec_id < 3
        |), s AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS sim
        |  FROM embeddings e, q
        |), r AS (
        |  SELECT query_id, vec_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
        |  FROM s
        |)
        |SELECT query_id, rank, vec_id,
        |  CAST(floor(sim * 1000000) AS BIGINT) AS sim_micro
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "q_knn_graph" ->
      """WITH s AS (
        |  SELECT a.vec_id, b.vec_id AS neighbor_id,
        |    list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS sim
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id <> b.vec_id
        |), r AS (
        |  SELECT vec_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM s
        |)
        |SELECT vec_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
        |  CAST(floor(sim * 1000000) AS BIGINT) AS sim_micro
        |FROM r WHERE rank <= 5 ORDER BY vec_id, rank""".stripMargin,
    "q_media_frames" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n,
        |    unnest(generate_series(0,
        |      CAST(greatest(floor((octet_length(encode(text)) - 1) / 32.0), 0)
        |        AS INTEGER))) AS frame_idx
        |  FROM documents
        |)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(least(32, n - frame_idx * 32) AS INTEGER) AS frame_bytes
        |FROM f WHERE frame_idx % 4 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // header lengths are synthesis constants (PNG sig+IHDR+CRC = 33,
    // JPEG SOI+SOF0 = 21, GIF sig+screen descriptor = 13); width/
    // height recompute the synthesis arithmetic — the Spark side must
    // PARSE the same numbers back out of the header bytes to match
    "q_media_meta" ->
      """WITH m AS (
        |  SELECT doc_id, text,
        |    CASE doc_id % 3 WHEN 0 THEN 'image/png'
        |         WHEN 1 THEN 'image/jpeg' ELSE 'image/gif' END AS mime,
        |    CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 21 ELSE 13 END AS hdr,
        |    CAST(64 + (doc_id * 7919 + length(text)) % 512 AS INTEGER) AS width,
        |    CAST(64 + (doc_id * 104729 + length(text)) % 512 AS INTEGER) AS height,
        |    octet_length(encode(text)) AS body
        |  FROM documents
        |)
        |SELECT doc_id, mime, width, height,
        |  CAST(hdr + body AS INTEGER) AS n_bytes,
        |  CASE WHEN body > 0 THEN
        |    CAST(list_sum(list_transform(generate_series(1, body),
        |      i -> CAST('0x' || substr(hex(encode(text)), 2*i-1, 2) AS INTEGER))) AS DOUBLE)
        |      / body
        |    ELSE 0.0 END AS mean_byte
        |FROM m ORDER BY doc_id""".stripMargin,
    // DuckDB's md5() takes VARCHAR (hashing its UTF-8 bytes), which is
    // exactly Spark's md5(encode(text, 'UTF-8')) over the payload
    "q_media_dedup" ->
      """SELECT md5(text) AS payload_md5, min(doc_id) AS keep_doc_id,
        |  count(*) AS n_copies,
        |  CAST(min(octet_length(encode(text))) AS INTEGER) AS n_bytes
        |FROM documents GROUP BY 1 ORDER BY payload_md5""".stripMargin,
    // header lengths are synthesis constants (WAV RIFF+fmt+data = 44;
    // MP4 ftyp 16 + moov 8+108+100·traks + mdat header 8); stream
    // parameters recompute the synthesis arithmetic — the Spark side
    // must PARSE the same numbers back out of the container bytes.
    // WAV duration = data bytes · 1000 / byte-rate (floor division);
    // MP4 timescale is 1000, so mvhd duration units are already ms
    "q_media_av" ->
      """WITH m AS (
        |  SELECT doc_id, doc_id % 2 AS kind,
        |    CAST(8000 + 100 * ((doc_id * 7919 + length(text)) % 441) AS INTEGER) AS sr,
        |    CAST(1 + (doc_id * 31 + length(text)) % 2 AS INTEGER) AS ch,
        |    CAST(64 + (doc_id * 7919 + length(text)) % 512 AS INTEGER) AS w,
        |    CAST(64 + (doc_id * 104729 + length(text)) % 512 AS INTEGER) AS h,
        |    CAST(1000 + (doc_id * 104729 + length(text)) % 60000 AS BIGINT) AS dur,
        |    CAST(1 + (doc_id * 13 + length(text)) % 2 AS INTEGER) AS ntrk,
        |    octet_length(encode(text)) AS body
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CASE kind WHEN 0 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
        |  CAST(CASE kind WHEN 0 THEN sr ELSE 0 END AS INTEGER) AS sample_rate,
        |  CAST(CASE kind WHEN 0 THEN ch ELSE 0 END AS INTEGER) AS channels,
        |  CAST(CASE kind WHEN 0 THEN 0 ELSE w END AS INTEGER) AS width,
        |  CAST(CASE kind WHEN 0 THEN 0 ELSE h END AS INTEGER) AS height,
        |  CAST(CASE kind WHEN 0 THEN (body * 1000) // (sr * ch * 2)
        |       ELSE dur END AS BIGINT) AS duration_ms,
        |  CAST(CASE kind WHEN 0 THEN 1 ELSE ntrk END AS INTEGER) AS n_tracks,
        |  CAST(CASE kind WHEN 0 THEN 44 + body
        |       ELSE 140 + 100 * ntrk + body END AS INTEGER) AS n_bytes
        |FROM m ORDER BY doc_id""".stripMargin,
    // pixel values are constant per scanline — (doc_id%64) + y, plus
    // channel offsets 0/40/80 on odd (RGB) docs — so the decoded
    // statistics have closed forms: mean = base + chanMean + (h-1)/2,
    // min = base, max = base + chanMax + h-1. The Spark side must
    // inflate + unfilter the actual PNG bytes to reproduce them.
    "q_media_pixels" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(16 + (doc_id * 7919 + length(text)) % 64 AS INTEGER) AS w,
        |    CAST(16 + (doc_id * 104729 + length(text)) % 64 AS INTEGER) AS h,
        |    CAST(doc_id % 64 AS INTEGER) AS base,
        |    doc_id % 2 AS rgb
        |  FROM documents
        |)
        |SELECT doc_id, 'image/png' AS mime, w AS width, h AS height,
        |  CAST(w * h AS INTEGER) AS n_px,
        |  base + CASE rgb WHEN 0 THEN 0.0 ELSE 40.0 END + (h - 1) / 2.0
        |    AS mean_px,
        |  base AS min_px,
        |  CAST(base + CASE rgb WHEN 0 THEN 0 ELSE 80 END + h - 1
        |    AS INTEGER) AS max_px
        |FROM m ORDER BY doc_id""".stripMargin,
    // GIF pixel index at (x, y) is base + x + y (base = doc_id%64,
    // w,h ≤ 63 so no 8-bit wrap), palette grayscale — decoded RGB
    // stats have closed forms: mean = base + (w−1)/2 + (h−1)/2,
    // min = base, max = base + w + h − 2. The Spark side must unpack
    // the variable-width LZW stream to reproduce them.
    "q_media_gif" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(16 + (doc_id * 6007 + length(text)) % 48 AS INTEGER) AS w,
        |    CAST(16 + (doc_id * 9973 + length(text)) % 48 AS INTEGER) AS h,
        |    CAST(doc_id % 64 AS INTEGER) AS base
        |  FROM documents
        |)
        |SELECT doc_id, 'image/gif' AS mime, w AS width, h AS height,
        |  CAST(w * h AS INTEGER) AS n_px,
        |  base + (w - 1) / 2.0 + (h - 1) / 2.0 AS mean_px,
        |  base AS min_px,
        |  CAST(base + w + h - 2 AS INTEGER) AS max_px
        |FROM m ORDER BY doc_id""".stripMargin,
    // samples are a·((i mod 200) − 100): per-200-cycle sums are
    // constants (Σ = −100, Σ² = 666700) and the partial ramp has
    // polynomial closed forms, so integer sample sums — and the
    // IEEE-exact mean/RMS derived from them — are recomputable
    // without decoding. n ≥ 256 > 200 pins peak at 100·a.
    "q_media_audio" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(256 + 2 * ((doc_id * 7919 + length(text)) % 512) AS INTEGER) AS n,
        |    CAST(1 + doc_id % 5 AS BIGINT) AS a,
        |    CAST(8000 + 100 * ((doc_id * 7919 + length(text)) % 441) AS INTEGER) AS sr,
        |    CAST(1 + (doc_id * 31 + length(text)) % 2 AS INTEGER) AS ch
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, n, a, sr, ch, n // 200 AS f, n % 200 AS k
        |  FROM m
        |), t AS (
        |  SELECT doc_id, n, a, sr, ch,
        |    a * (f * -100 + (k * (k - 1) // 2 - 100 * k)) AS sum,
        |    a * a * (f * 666700 + ((k - 1) * k * (2 * k - 1) // 6
        |      - 100 * k * (k - 1) + 10000 * k)) AS ss
        |  FROM s
        |)
        |SELECT doc_id, 'audio/wav' AS mime, sr AS sample_rate,
        |  ch AS channels, n AS n_samples,
        |  CAST(sum AS DOUBLE) / n AS mean_amp,
        |  sqrt(CAST(ss AS DOUBLE) / n) AS rms_amp,
        |  CAST(100 * a AS INTEGER) AS peak_amp
        |FROM t ORDER BY doc_id""".stripMargin,
  )
}
