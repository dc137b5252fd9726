package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The sf1 generator must be a drop-in for the driver's testdata: same
  * schemas (the oracle gate and TestdataCanary are encoding-sensitive),
  * same layout invariants, and bit-for-bit determinism (the scaling
  * table is only comparable if the data is reproducible).
  */
class GenDataSpec extends SparkSpec {

  private val driverSf = "/root/testdata/sf0.001"

  private lazy val genDir = {
    val dir = Files.createTempDirectory("gendata").toString
    GenData.generate(spark, dir, 0.001, driverSf)
    dir
  }

  test("generated tables carry exactly the driver tables' schemas") {
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings")) {
      val want = spark.read.parquet(s"$driverSf/$t.parquet").schema
      val got = spark.read.parquet(s"$genDir/$t.parquet").schema
      assert(got === want, s"schema drift in $t")
    }
    // events goes through the adaptive loader on both sides (it
    // normalizes the ts encoding the same way for both files)
    assert(Tables.events(spark, genDir).schema ===
      Tables.events(spark, driverSf).schema)
  }

  test("generated events keep the driver layout: ts-ordered, 30-day 2024 window") {
    val ev = Tables.events(spark, genDir)
    // event_id in ts order (lag over event_id order never decreases)
    val w = org.apache.spark.sql.expressions.Window.orderBy("event_id")
    val disordered = ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts") > col("ts")).count()
    assert(disordered === 0L)
    val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
    assert(mm.getTimestamp(0).toString.startsWith("2024-01-01"))
    assert(mm.getTimestamp(1).toString.startsWith("2024-01-3"))
  }

  test("generated embeddings are 64-dim unit vectors; documents draw from the driver vocab") {
    val emb = spark.read.parquet(s"$genDir/embeddings.parquet")
    val bad = emb.filter(
      size(col("embedding")) =!= 64 ||
        abs(sqrt(aggregate(col("embedding"), lit(0.0d),
          (a, v) => a + v * v)) - 1.0d) > 1e-5).count()
    assert(bad === 0L)
    val docs = spark.read.parquet(s"$genDir/documents.parquet")
    val driverVocab = spark.read.parquet(s"$driverSf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    val genVocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(genVocab.subsetOf(driverVocab),
      s"generator vocab outside driver vocab: ${genVocab -- driverVocab}")
    assert(docs.filter(col("n_chars") =!= length(col("text"))).count() === 0L)
  }

  test("generation is deterministic: two runs produce identical bytes of data") {
    val dir2 = Files.createTempDirectory("gendata2").toString
    GenData.generate(spark, dir2, 0.001, driverSf)
    for (t <- Seq("customer", "lineitem", "events", "documents", "embeddings")) {
      val a = spark.read.parquet(s"$genDir/$t.parquet")
      val b = spark.read.parquet(s"$dir2/$t.parquet")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"nondeterministic generation in $t")
    }
  }

  test("writeSingle caps row groups at 8 MiB so single-file tables stay splittable") {
    // Spark parallelizes a scan only across row-group boundaries; a
    // single-file table with ONE row group is a one-task scan no
    // matter what maxPartitionBytes says (and AQE skew splits, which
    // cut along map-output boundaries, become impossible). ~30 MB of
    // incompressible payload must land as several bounded row groups.
    val dir = Files.createTempDirectory("gendata-rg").toString
    val df = spark.range(1000000L)
      .select(col("id"), md5(col("id").cast("string")).as("pad"))
    GenData.writeSingle(df, dir, "wide")
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(s"$dir/wide.parquet"),
      spark.sessionState.newHadoopConf())
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks
      assert(blocks.size() > 1, "single row group — file is unsplittable")
      blocks.forEach { b =>
        assert(b.getCompressedSize <= 16L * 1024 * 1024,
          s"row group ${b.getCompressedSize} bytes exceeds the 8 MiB target (2x slack)")
      }
    } finally reader.close()
  }

  test("events.parquet ON-DISK row order is globally ts-sorted") {
    // The driver-layout contract (GenData.scala:19) is about the
    // FILE, not just the values: writeSingle's read-back scan orders
    // splits by file length descending (bin-packing), so without the
    // explicit row-index restore the single file's physical row order
    // silently loses the generator's global ts sort whenever wide
    // part files differ in size. Read the file as ONE split (huge
    // maxPartitionBytes → one task reads it sequentially = file
    // order) and require ts non-decreasing front to back.
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (1L << 40).toString)
      val ev = Tables.events(spark, genDir).select(col("ts"))
      assert(ev.rdd.getNumPartitions === 1, "need a single-split read")
      val ts = ev.collect().map(_.getTimestamp(0).getTime)
      assert(ts.length >= 1000)
      val disordered = ts.zip(ts.tail).count { case (a, b) => a > b }
      assert(disordered === 0,
        s"$disordered adjacent on-disk row pairs out of ts order")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("hostile garnish follows the dup SEED: copy pairs keep their dup structure") {
    // A dup copy draws its garnish from its SOURCE's seed — exact-dup
    // pairs must stay byte-identical and near-dup pairs must differ in
    // exactly one token on the hostile corpus, or the hostile axis
    // stops exercising the dedup/LSH queries' dup structure. Recover
    // each copy's source by replicating the generator's seed/kind
    // hash (GenData.documents) and join copy to source text.
    val n = 5000L
    val host = GenData.documents(spark, n, hostile = true)
      .select(col("doc_id"), col("text"))
    val kind = pmod(xxhash64(lit("ddup"), col("doc_id")), lit(1000L))
      .cast("int")
    val seed = when(col("doc_id") > 0 && kind < 12,
      pmod(xxhash64(lit("dsrc"), col("doc_id")), col("doc_id")))
      .otherwise(col("doc_id"))
    val copies = host.withColumn("kind", kind).withColumn("seed", seed)
      .filter(col("kind") < 12 && col("seed") =!= col("doc_id"))
    // restrict to NON-DUP sources: a chained source (itself a copy)
    // draws its own text from ITS seed, so copy != source text there
    // by construction — the pair invariant is defined against the
    // words the copy's seed generates, i.e. a non-dup source row
    val joined = copies.join(
      host.withColumn("skind", kind)
        .filter(col("skind") >= 12 || col("doc_id") === 0L)
        .select(col("doc_id").as("seed"), col("text").as("src_text")),
      "seed")
    val exact = joined.filter(col("kind") < 2)
    val near = joined.filter(col("kind") >= 2)
    assert(exact.count() > 0 && near.count() > 0,
      "corpus too small to carry dup pairs")
    assert(exact.filter(col("text") =!= col("src_text")).count() === 0L,
      "an exact-dup copy diverged from its source on the hostile corpus")
    // near dups: same token count (substitution, and garnish is
    // identical on both sides) and AT MOST one differing token (the
    // substituted word collides with the original ~1/31 of the time,
    // which legitimately yields a zero-diff "near" dup)
    val tokDiff = size(filter(
      zip_with(split(col("text"), " "), split(col("src_text"), " "),
        (a, b) => a =!= b),
      x => x))
    val badNear = near.filter(
      size(split(col("text"), " ")) =!= size(split(col("src_text"), " "))
        || tokDiff > 1).count()
    assert(badNear === 0L,
      s"$badNear near-dup hostile pairs differ by more than one token")
  }

  test("skew mode: same schemas, Zipf hot keys; non-key columns untouched") {
    val dir = Files.createTempDirectory("gendata-skew").toString
    GenData.generate(spark, dir, 0.001, driverSf, skewed = 1)
    for (t <- Seq("orders", "lineitem", "documents")) {
      assert(spark.read.parquet(s"$dir/$t.parquet").schema ===
        spark.read.parquet(s"$genDir/$t.parquet").schema,
        s"skew mode drifted the $t schema")
    }
    assert(Tables.events(spark, dir).schema === Tables.events(spark, genDir).schema)
    // hot key 0 absorbs ~ln2/ln(n+1) of rows (log-uniform Zipf);
    // uniform gives 1/n. events: n_users = 1000/67 = 14 → expect
    // ~25.6% on user 0 vs ~7% uniform; event_type: ~38.7% on the
    // hot symbol vs 20%
    val ev = Tables.events(spark, dir)
    val n = ev.count().toDouble
    val hotUser = ev.groupBy("user_id").count()
      .orderBy(col("count").desc).head()
    assert(hotUser.getLong(0) === 0L, "rank 0 must be the hot user")
    assert(hotUser.getLong(1) / n > 0.15, "user skew must be real")
    val hotType = ev.groupBy("event_type").count()
      .orderBy(col("count").desc).head()
    assert(hotType.getString(0) === "view" && hotType.getLong(1) / n > 0.30)
    // non-key columns keep their uniform-mode values row-for-row:
    // same id → same ts/value (the A/B isolates KEY distribution)
    val u = Tables.events(spark, genDir).select("event_id", "value")
    val s = ev.select("event_id", "value")
    // note event_id is a ts-rank, and ts is id-hash-derived and
    // unchanged by skew, so the event_id↔value pairing must agree
    assert(u.exceptAll(s).isEmpty && s.exceptAll(u).isEmpty)
    // lineitem: hot l_orderkey exists and uniform mode has none
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val hotOrd = li.groupBy("l_orderkey").count()
      .orderBy(col("count").desc).head()
    assert(hotOrd.getLong(0) === 0L &&
      hotOrd.getLong(1) > li.count() / 50, "order-key skew must be real")
  }
}
