package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/**
 * Continuous embedding stream → searchable IVF index: each micro-batch
 * of arriving vectors folds into the persisted ANN index — the first
 * batch trains the model and builds the store
 * ([[Similarity.writeIvfIndex]]), every later batch lands through the
 * stored-model append ([[Similarity.appendToIvfIndex]]) — so nearest-
 * neighbor serving trails ingestion by one trigger instead of waiting
 * for a corpus-wide rebuild. The vector-side twin of
 * [[StreamingRetrieval.indexIngest]].
 *
 * Bootstrap-model posture: training on the FIRST wave and appending
 * with that model afterwards is the standard online-IVF operating
 * contract — the model is only as stale as the last re-train, drift is
 * detected out-of-band (`Similarity.centroidDrift`) and answered by
 * [[Similarity.retrainIvfIndex]], never per batch.
 *
 * Exactly-once effect WITHOUT a transactional sink: foreachBatch is
 * at-least-once, and the append's vec_id anti-join against the stored
 * vectors makes a replayed batch a no-op; a first-batch crash after the
 * build is the same replay no-op (centroids exist → append path →
 * anti-join). Serving ([[Similarity.ivfStoredTopK]]) stays separate and
 * unchanged — readers see the store between batch commits.
 */
object StreamingSimilarity {

  /** `hier = true` bootstraps through [[Similarity.writeIvfIndexHier]]
    * — the √cells assignment path for streams whose cell count scales
    * with the corpus. The store layout is IDENTICAL (leaf centroids +
    * cell-partitioned vectors), so appends, serving, and the whole
    * lifecycle run the shared flat-leaf machinery unchanged; only the
    * bootstrap (and, in the retrain variant, the drift response) pays
    * the cheaper two-level training. */
  def ivfIngest(vecs: DataFrame, indexPath: String, checkpoint: String,
                kCells: Int = 4, iters: Int = 2,
                hier: Boolean = false,
                trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        // ONE materialization of the micro-batch feeds every pass over it
        // (bootstrap training re-reads the batch per k-means iteration
        // plus once for the assignment write — each pass re-scanned the
        // source files otherwise). Trigger-sized, unpersisted per batch —
        // bounded at any scale (guide §2: don't recompute what one
        // bounded cache covers).
        val batch = batch0.persist()
        try {
          val spark = batch.sparkSession
          // an empty batch must not bootstrap-train (k-means on zero
          // vectors fails loudly); the NEXT non-empty batch builds instead
          if (!batch.isEmpty) {
            // the INDEX PATH's filesystem, not the default one (the
            // StreamingRetrieval scheme-mismatch gotcha)
            val cents = new org.apache.hadoop.fs.Path(s"$indexPath/centroids")
            val fs = cents.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (!fs.exists(cents)) {
              if (hier) Similarity.writeIvfIndexHier(batch, indexPath, kCells, iters)
              else Similarity.writeIvfIndex(batch, indexPath, kCells, iters)
            }
            else Similarity.appendToIvfIndex(spark, indexPath, batch)
          }
        } finally batch.unpersist()
      }
      .start()

  /**
   * Continuous embedding stream → searchable PCA-IVF store —
   * [[ivfIngest]]'s maintainer over the two-model unit: the first
   * non-empty micro-batch fits the basis, trains the PCA-space cells,
   * and builds the store ([[Similarity.writePcaIvfIndex]]); every later
   * batch projects through the STORED basis and appends into cells
   * assigned by the STORED centroids ([[Similarity.appendToPcaIvfIndex]]
   * — batch-sized, replay-safe, models untouched). Serving sees each
   * batch as soon as its append lands; both models age until the drift
   * maintainer retrains, the standard operating contract.
   */
  def pcaIvfIngest(vecs: DataFrame, indexPath: String, checkpoint: String,
                   dims: Int = 16, kCells: Int = 4, iters: Int = 2,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        // one materialized batch feeds the PCA fit + k-means passes +
        // assignment write of the bootstrap (see ivfIngest's note)
        val batch = batch0.persist()
        try {
          val spark = batch.sparkSession
          // existence of the BASIS decides bootstrap vs append — it is
          // the store-table the build lands after vectors/centroids, so a
          // half-built store re-bootstraps rather than appending through
          // a missing model
          val modelDir = new org.apache.hadoop.fs.Path(s"$indexPath/pcamodel")
          val fs = modelDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (!batch.isEmpty) {
            if (!fs.exists(modelDir))
              Similarity.writePcaIvfIndex(batch, indexPath, dims, kCells, iters)
            else Similarity.appendToPcaIvfIndex(spark, indexPath, batch)
          }
        } finally batch.unpersist()
      }
      .start()

  /**
   * Continuous embedding stream → IVF-PQ store — the memory-bound
   * serving tier kept current by ingest: bootstrap builds
   * ([[Similarity.writeIvfPqIndex]] — codebooks derive from the trained
   * centroids), later batches append with cells AND codes from the
   * stored model ([[Similarity.appendToIvfPqIndex]]). The `centroids`
   * table decides bootstrap vs append — it is the last table the build
   * lands for this store.
   */
  def ivfPqIngest(vecs: DataFrame, indexPath: String, checkpoint: String,
                  kCells: Int = 4, iters: Int = 2,
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        // one materialized batch feeds the k-means passes + encode write
        // of the bootstrap (see ivfIngest's note)
        val batch = batch0.persist()
        try {
          val spark = batch.sparkSession
          if (!batch.isEmpty) {
            val cents = new org.apache.hadoop.fs.Path(s"$indexPath/centroids")
            val fs = cents.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (!fs.exists(cents))
              Similarity.writeIvfPqIndex(batch, indexPath, kCells, iters)
            else Similarity.appendToIvfPqIndex(spark, indexPath, batch)
          }
        } finally batch.unpersist()
      }
      .start()

  /**
   * Continuous embedding stream → persisted SRP-LSH store —
   * [[ivfIngest]]'s maintainer for the sign-bit bucketing: the first
   * non-empty micro-batch derives the hyperplanes (its lowest ids — the
   * deterministic plane rule) and builds the store
   * ([[Similarity.writeSrpIndex]] — one atomic swap unit); every later
   * batch buckets through the STORED planes
   * ([[Similarity.appendToSrpIndex]] — batch-sized, replay-safe via the
   * shared id anti-join). The `planes` table decides bootstrap vs
   * append — the whole store lands atomically, so its presence proves a
   * complete build.
   */
  def srpIngest(vecs: DataFrame, indexPath: String, checkpoint: String,
                numPlanes: Int = 8,
                trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        // one materialized batch feeds the plane derivation + bucketed
        // write of the bootstrap (see ivfIngest's note)
        val batch = batch0.persist()
        try {
          val spark = batch.sparkSession
          if (!batch.isEmpty) {
            val planes = new org.apache.hadoop.fs.Path(s"$indexPath/planes")
            val fs = planes.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (!fs.exists(planes))
              Similarity.writeSrpIndex(batch, indexPath, numPlanes)
            else Similarity.appendToSrpIndex(spark, indexPath, batch)
          }
        } finally batch.unpersist()
      }
      .start()

  /**
   * Continuous embedding stream → persisted RESIDUAL-IVFADC store: the
   * first non-empty batch trains the coarse model AND the residual
   * codebooks and lands the whole unit atomically
   * ([[Similarity.writeIvfPqResidualIndex]]); later batches assign
   * cells and residual codes through the STORED model pair
   * ([[Similarity.appendToIvfPqResidualIndex]]). `residcb` decides
   * bootstrap vs append (atomic store — presence proves completeness).
   */
  def ivfPqResidualIngest(vecs: DataFrame, indexPath: String, checkpoint: String,
                          kCells: Int = 4, iters: Int = 2,
                          kCodes: Int = 8, codeIters: Int = 2,
                          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        // one materialized batch feeds BOTH trainings (coarse + residual
        // codebooks) and the encode write (see ivfIngest's note)
        val batch = batch0.persist()
        try {
          val spark = batch.sparkSession
          if (!batch.isEmpty) {
            val cb = new org.apache.hadoop.fs.Path(s"$indexPath/residcb")
            val fs = cb.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (!fs.exists(cb))
              Similarity.writeIvfPqResidualIndex(batch, indexPath,
                kCells, iters, kCodes, codeIters)
            else Similarity.appendToIvfPqResidualIndex(spark, indexPath, batch)
          }
        } finally batch.unpersist()
      }
      .start()

  /**
   * [[ivfIngest]] with the drift-response loop CLOSED: after each
   * stored-model append, the maintainer measures how far the data has
   * moved under the model — [[Similarity.centroidDrift]] between the
   * STORED centroids (each cell's label carrying its one trained vector)
   * and the stored corpus labeled by its cell partitions, i.e. per cell
   * the cosine of trained-centroid vs the cell's CURRENT mean — and when
   * any cell drops below `driftCosine`, fires
   * [[Similarity.retrainIvfIndex]]: the whole-store model+vectors swap
   * whose post-state is indistinguishable from a fresh build over the
   * live corpus (the knn_ivf_retrained contract). This is the operating
   * loop the bootstrap-model posture defers to ("re-train on drift, not
   * per batch"), now running inside the ingest query itself.
   *
   * Replay-safe like the rest of the maintainer: the append anti-joins
   * replayed ids away, the drift check re-reads the store, and a
   * replayed retrain rebuilds the identical deterministic model. The
   * per-batch drift check is O(cells), NOT O(corpus): each append also
   * folds its per-cell (count, decimal sums) into the store's
   * `cellfacts` side table ([[Similarity.mergeCellFacts]] — cells-sized,
   * exactly equal to a recompute because decimal sums merge
   * associatively), and [[Similarity.ivfDriftFromFacts]] reads facts +
   * centroids only — the old posture re-projected the whole corpus per
   * micro-batch, which cannot fly at 100 TB. A retrain rebuilds the
   * facts inside its swap; a missing facts table (crash window)
   * self-heals with one rebuild pass. `onRetrain(batchId)` is the
   * observability hook.
   */
  def ivfIngestWithRetrain(vecs: DataFrame, indexPath: String, checkpoint: String,
                           kCells: Int = 4, iters: Int = 2,
                           driftCosine: Double = 0.95,
                           onRetrain: Long => Unit = _ => (),
                           hier: Boolean = false,
                           trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        // one materialized batch feeds the bootstrap's training passes /
        // the append's screen+assign write (see ivfIngest's note)
        val batch = batch0.persist()
        try {
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions.{col, min}
        if (!batch.isEmpty) {
          val cents = new org.apache.hadoop.fs.Path(s"$indexPath/centroids")
          val fs = cents.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (!fs.exists(cents)) {
            if (hier) Similarity.writeIvfIndexHier(batch, indexPath, kCells, iters)
            else Similarity.writeIvfIndex(batch, indexPath, kCells, iters)
            Similarity.rebuildCellFacts(spark, indexPath)
          } else {
            // the append folds its per-cell facts in; a missing facts
            // table (bootstrap/retrain crash window) self-heals inside
            // mergeCellFacts with one rebuild pass
            Similarity.appendToIvfIndex(spark, indexPath, batch,
              updateFacts = true)
            // O(cells) drift read — facts + centroids, never the corpus
            val worst = Similarity.ivfDriftFromFacts(spark, indexPath)
              .agg(min(col("drift_cosine"))).collect()(0)
            if (!worst.isNullAt(0) && worst.getDouble(0) < driftCosine) {
              Similarity.retrainIvfIndex(spark, indexPath, kCells, iters,
                hier = hier)
              onRetrain(batchId)
            }
          }
        }
        } finally batch.unpersist()
      }
      .start()
}
