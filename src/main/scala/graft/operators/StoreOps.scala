package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared maintenance plumbing for the persisted-artifact stores
  * (CandleStore, BandStore, IvfStore): the rewrite-and-swap step of
  * in-place compaction.
  */
private[operators] object StoreOps {

  /** Promote a rewritten copy over the live store. Atomic-ish swap
    * through the Hadoop FileSystem API (works on local paths and HDFS
    * alike; rename is a metadata op on both). True object stores (S3)
    * have no atomic rename — use a manifest-committing table format
    * there instead.
    */
  def swapInPlace(spark: SparkSession, path: String, tmp: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".old")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.rename(dst, bak), s"could not move $path aside")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
      s"could not promote $tmp")
    fs.delete(bak, true)
  }
}
