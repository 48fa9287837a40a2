package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The crash-safe table-rewrite swap shared by every persisted-index
 * compaction (near-dup, BM25, tag index): rewrite to `.{table}.compact`,
 * then `live → .{table}.old`, `.compact → live`, drop `.old`. A crash at
 * ANY point leaves a servable or recoverable copy:
 *  - before the first rename: live untouched;
 *  - between the renames: the only copy sits at `.old` — the next run's
 *    recovery rename restores it before doing anything else;
 *  - a failed second rename rolls `.old` back so the store stays
 *    servable.
 * Never read-and-overwrite in place (the GraftStorage.compact rule).
 */
object AtomicSwap {

  /** `rewrite` receives the live table and must write its replacement to
    * `$path/.$table.compact`. */
  def swapTable(spark: SparkSession, path: String, table: String)
               (rewrite: DataFrame => Unit): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val live = new org.apache.hadoop.fs.Path(s"$path/$table")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/.$table.compact")
    val old = new org.apache.hadoop.fs.Path(s"$path/.$table.old")
    if (!fs.exists(live) && fs.exists(old))
      require(fs.rename(old, live), s"crash recovery failed for $table")
    fs.delete(tmp, true); fs.delete(old, true)
    rewrite(spark.read.parquet(live.toString))
    require(fs.rename(live, old), s"compaction swap failed for $table")
    if (!fs.rename(tmp, live)) {
      fs.rename(old, live) // roll back so the store stays servable
      throw new IllegalStateException(s"compaction swap failed for $table (rolled back)")
    }
    fs.delete(old, true)
  }
}
