package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER lets the multi-JVM audit run the same gate
    // under local-cluster[n,c,m] (real Netty shuffles + serialized
    // broadcasts); executor-side confs ride in as -Dspark.* sysprops.
    // The driver never sets it, so the contract is unchanged.
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      // plan-shape invariance knobs for the determinism gates (driver
      // never sets either, contract unchanged): every query's OUTPUT
      // must be identical with AQE disabled and under any shuffle
      // partition count — a value that depends on either is a
      // partial-aggregation-order bug waiting for a cluster.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      // scan-split size; unset ⇒ Spark default (see Bench)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "128m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // sampled-cohort big-SF gate (Tables.maybeSample scaladoc): the
    // engine dump and the DuckDB compare (check_ckpt --sample-mod)
    // restrict the corpus tables to id % k == 0 in lockstep. The
    // driver never sets it; contract unchanged.
    sys.env.get("SPARK_GRAFT_SAMPLE_MOD").foreach { k =>
      System.err.println(s"[verify] sampled-cohort mode: id % $k == 0")
      spark.conf.set("graft.sample.idMod", k)
    }
    new java.io.File(outDir).mkdirs()
    // local-iteration aid: SPARK_GRAFT_ONLY=q_a,q_b restricts the dump
    // (and the oracle manifest) to the named queries; the driver never
    // sets it, so the contract is unchanged.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(ks) => SparkEntry.queries.view.filterKeys(ks).toMap
      case None => SparkEntry.queries
    }
    // A crashed query must be LOUD: it writes an error sidecar and the
    // run exits nonzero. (Round 5 shipped with 54 silently-crashed
    // queries because failures only went to stderr — the gate's
    // denominator shrank and everything looked green.) A HUNG query is
    // worse still — no sidecar, no output, the whole gate stalls — so
    // each query runs under a watchdog: on timeout its Spark job group
    // is cancelled, the failure is recorded, and the dump moves on.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val timeoutS = sys.env.getOrElse("SPARK_GRAFT_TIMEOUT_S", "1800").toLong
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // An ExactScale refusal is the DESIGNED outcome when a corpus-sized
    // input reaches an exact Θ(n²) ground-truth path (sf10: documents
    // 500k / embeddings 250k vs the 100k guard) — record it separately
    // so a big-SF gate can be "clean modulo itemized guards" without
    // hiding genuine crashes. The driver's SF never trips a guard, so
    // its contract (_failures.json + exit code) is unchanged.
    val guarded = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def fail(name: String, msg: String): Unit = {
      if (msg != null && msg.contains("exact all-pairs (quadratic)")) {
        System.err.println(s"[verify] $name guarded (by design): $msg")
        guarded(name) = msg
      } else {
        System.err.println(s"[verify] $name failed: $msg")
        failures(name) = msg
        Files.writeString(Paths.get(s"$outDir/$name.err.txt"), msg)
      }
    }
    // Crash-resume aid for multi-hour big-SF gates (a 170-query sf10
    // dump is hours of recompute after an OOM kill): skip queries whose
    // output dir already holds a parquet success marker. Skipped
    // queries keep their prior dump verbatim — the DuckDB compare is
    // what decides correctness, so a stale dump can only FAIL, never
    // falsely pass. The driver never sets it; contract unchanged.
    val resume = sys.env.get("SPARK_GRAFT_RESUME").contains("1")
    def alreadyDumped(name: String): Boolean =
      Files.exists(Paths.get(s"$outDir/$name/_SUCCESS"))
    selected.foreach { case (name, fn) =>
      if (resume && alreadyDumped(name)) {
        System.err.println(s"[verify] $name skipped (resume: dump exists)")
      } else {
      val group = s"verify-$name"
      val run = Future {
        // job group is thread-local: set it on the thread that fires
        // the Spark actions so cancelJobGroup reaches them
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        finally spark.sparkContext.clearJobGroup()
      }
      try Await.result(run, timeoutS.seconds)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(group)
          fail(name, s"timed out after ${timeoutS}s (job group cancelled)")
        case e: Throwable =>
          fail(name, Option(e.getMessage).getOrElse(e.getClass.getName))
      }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = only.fold(SparkEntry.oracleSql)(ks =>
        SparkEntry.oracleSql.view.filterKeys(ks).toMap)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val failJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_failures.json"), failJson)
    val guardJson = guarded
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_guarded.json"), guardJson)
    if (guarded.nonEmpty)
      System.err.println(
        s"[verify] ${guarded.size} queries refused by the ExactScale " +
          s"guard (designed at this SF): ${guarded.keys.mkString(", ")}")
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(
        s"[verify] ${failures.size}/${selected.size} queries FAILED: " +
          failures.keys.mkString(", "))
      sys.exit(1)
    }
  }
}
