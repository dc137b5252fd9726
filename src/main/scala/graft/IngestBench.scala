package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.{Ingest, Tables, ZstdJniCodec}

/** Scale row for third-party-format ingest (VERDICT r12 #5):
  * q_ingest_quarantine certifies the PERMISSIVE quarantine semantics
  * at sf0.01; real corpus drops are many files × GBs with mixed
  * good/bad ratios. This bench builds a multi-file zstd-jsonl drop at
  * a configurable multiple of the documents table — with a HOSTILE
  * garnish (every 7th replica's text gains embedded newline, quote,
  * comma, backslash and a non-BMP pair, so the measured path is the
  * escaping-heavy one, not the tame-corpus fast path) and the same
  * doc_id%50 corruption rule the oracle-gated query uses — then
  * measures the quarantine ingest (read + permissive parse + split
  * aggregates) against the same aggregates off the parquet ingest
  * path.
  *
  * Parallelism note (also at [[ZstdJniCodec]]): a zstd text file is
  * not splittable, so the drop's file count IS the scan parallelism —
  * ship drops as ≥ cores files (default here: 32). One giant .zst
  * file would serialize the whole ingest onto one task no matter the
  * cluster size; the knob to watch at 100 TB is files-per-drop, not
  * file size.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_INGEST_MULT
  * (replicas of the documents table; default 10 ⇒ sf1-equivalent
  * volume from sf0.1), SPARK_GRAFT_INGEST_FILES (drop file count,
  * default 32), SPARK_GRAFT_CPUS (default 32).
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_INGEST_MULT", "10").toInt
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_INGEST_FILES", "32").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ingest-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ZstdJniCodec.register(spark)
    val work = Files.createTempDirectory("graft-ingest-bench").toString

    // scaled corpus: doc_id stays unique (id*mult + rep); hostile
    // garnish on every 7th replica
    val hostile = "\nnew\"line, back\\slash é 😀 end"
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
      .crossJoin(spark.range(mult.toLong).select(col("id").as("rep")))
      .select((col("doc_id") * mult + col("rep")).as("doc_id"),
        col("source"),
        when(pmod(col("rep"), lit(7L)) === 0L,
          concat(col("text"), lit(hostile))).otherwise(col("text")).as("text"))
    docs.repartition(nFiles).write.parquet(s"$work/parquet")
    val src = spark.read.parquet(s"$work/parquet")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // build the drop (not the measured ingest path, but reported:
    // drops are produced once, read many times)
    val (_, tBuild) = timed {
      src.select(when(pmod(col("doc_id"), lit(50L)) === 0L,
            concat(lit("{corrupt drop line for doc "),
              col("doc_id").cast("string")))
          .otherwise(to_json(struct(col("doc_id"), col("source"),
            col("text"))))
          .as("value"))
        .repartition(nFiles)
        .write.option("compression", classOf[ZstdJniCodec].getName)
        .text(s"$work/jsonl")
    }
    val fs = new org.apache.hadoop.fs.Path(s"$work/jsonl")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val zstBytes = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$work/jsonl"), false)
      var b = 0L
      while (it.hasNext) { val st = it.next(); if (st.getPath.getName.startsWith("part")) b += st.getLen }
      b
    }

    // measured: the quarantine ingest — read, permissive parse
    // (eagerly materialized, the Ingest contract), split aggregates
    val schema = new StructType()
      .add("doc_id", LongType).add("source", StringType)
      .add("text", StringType)
    val ((nGood, nQuar, sumLen), tIngest) = timed {
      val parsed = Ingest.jsonWithQuarantine(spark, s"$work/jsonl", schema)
      val g = Ingest.good(parsed)
        .agg(count(lit(1)), sum(length(col("text")))).head()
      val q = Ingest.quarantined(parsed).agg(count(lit(1))).head()
      parsed.unpersist()
      (g.getLong(0), q.getLong(0), g.getLong(1))
    }

    // baseline: same aggregates straight off the parquet ingest path
    val ((pGood, pLen), tParquet) = timed {
      val r = src.filter(pmod(col("doc_id"), lit(50L)) =!= 0L)
        .agg(count(lit(1)), sum(length(col("text")))).head()
      (r.getLong(0), r.getLong(1))
    }
    require(nGood == pGood && sumLen == pLen,
      s"quarantine ingest diverged from parquet baseline: " +
        s"($nGood,$sumLen) vs ($pGood,$pLen)")

    val rows = nGood + nQuar
    val ratioMicro = if (rows == 0) 0L else nQuar * 1000000L / rows
    println(s"""{"metric":"ingest_scale","sf":"$sfDir","mult":$mult,""" +
      s""""files":$nFiles,"rows":$rows,"raw_text_chars":$sumLen,""" +
      s""""zst_bytes":$zstBytes,"n_good":$nGood,"n_quarantined":$nQuar,""" +
      s""""quarantine_ratio_micro":$ratioMicro,""" +
      s""""t_build_drop_s":${f"$tBuild%.2f"},""" +
      s""""t_quarantine_ingest_s":${f"$tIngest%.2f"},""" +
      s""""t_parquet_baseline_s":${f"$tParquet%.2f"},""" +
      s""""ingest_mb_per_s":${f"${sumLen / 1e6 / tIngest}%.1f"}}""")
    spark.stop()
  }
}
