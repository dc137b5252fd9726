package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.sources.Tables

/** The curation gates are pure projections/filters, so the SAME
  * operator calls must run unchanged on a streaming DataFrame — this
  * is the ingest-time curation deployment (filter documents as they
  * arrive, before anything lands in the lake). Proven here by running
  * quality verdicts + PII redaction over a MemoryStream of real
  * documents and comparing against the batch answers row-for-row.
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("quality verdicts and PII redaction give batch-identical answers on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf).limit(120)
      .select("doc_id", "text")
      .as[(Long, String)].collect()

    val input = MemoryStream[(Long, String)]
    val streamDocs = input.toDF().toDF("doc_id", "text")
    // the exact same operator calls as the batch queries
    val gated = Curation.qualityFilterVerdicts(streamDocs)
    val redacted = Curation.piiRedact(streamDocs)
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ids"),
        md5(col("redacted")).as("redacted_md5"))
    val q1 = gated.writeStream.format("memory")
      .queryName("cur_verdicts").outputMode("append").start()
    val q2 = redacted.writeStream.format("memory")
      .queryName("cur_redacted").outputMode("append").start()
    try {
      // two micro-batches: curation must not depend on batch boundaries
      input.addData(docs.take(50): _*)
      q1.processAllAvailable(); q2.processAllAvailable()
      input.addData(docs.drop(50): _*)
      q1.processAllAvailable(); q2.processAllAvailable()
    } finally { q1.stop(); q2.stop() }

    val batchDocs = Tables.documents(spark, sf).limit(120)
    val wantVerdicts = Curation.qualityFilterVerdicts(batchDocs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val gotVerdicts = spark.table("cur_verdicts")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(gotVerdicts === wantVerdicts && wantVerdicts.size === 120)

    val wantRedacted = Curation.piiRedact(batchDocs)
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ids"),
        md5(col("redacted")).as("redacted_md5"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    val gotRedacted = spark.table("cur_redacted")
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(gotRedacted === wantRedacted)
  }

  test("gopherRules gives batch-identical verdicts on a stream across micro-batch cuts") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf).limit(120)
      .select("doc_id", "text")
      .as[(Long, String)].collect()

    val input = MemoryStream[(Long, String)]
    val streamDocs = input.toDF().toDF("doc_id", "text")
    val q = Curation.gopherRules(streamDocs).writeStream.format("memory")
      .queryName("cur_gopher").outputMode("append").start()
    try {
      input.addData(docs.take(70): _*)
      q.processAllAvailable()
      input.addData(docs.drop(70): _*)
      q.processAllAvailable()
    } finally q.stop()

    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(8))).toMap
    val want = keyed(Curation.gopherRules(
      Tables.documents(spark, sf).limit(120)).collect())
    val got = keyed(spark.table("cur_gopher").collect())
    assert(got === want && want.size === 120)
  }
}
