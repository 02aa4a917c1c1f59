package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Lineage-truncation seam for the iterative operators (PageRank, k-core,
  * connected components, BPE merge rounds, the partitioned TransE
  * trainer): one config switch decides HOW per-round lineage is cut.
  *
  * Modes, from the session conf `spark.graft.checkpoint.mode`:
  *  - `local` (default): `localCheckpoint` — executor-local blocks,
  *    fastest, the right call on a stable cluster or local mode; blocks
  *    die with their executor, so a lost node fails the job rather than
  *    recomputing (there is no lineage left to recompute from).
  *  - `reliable`: `checkpoint()` into `sc.setCheckpointDir` — the
  *    cluster-FS mode for long iterative jobs on preemptible fleets,
  *    where losing executor N's blocks at iteration 40 of 50 must not
  *    kill the job. Requires the caller to have set a checkpoint dir;
  *    failing THAT loudly beats silently degrading to local blocks.
  *
  * The truncation contract is identical in both modes (plan cut at the
  * checkpoint, same rows), so operators calling through this seam are
  * mode-oblivious — GraphSpec asserts `graph_pagerank` produces the
  * identical result under both.
  */
object Checkpoints {
  val ModeKey = "spark.graft.checkpoint.mode"

  private def reliableMode(spark: SparkSession): Boolean =
    spark.conf.getOption(ModeKey).contains("reliable")

  private def requireDir(spark: SparkSession): Unit =
    require(spark.sparkContext.getCheckpointDir.isDefined,
      s"$ModeKey=reliable requires spark.sparkContext.setCheckpointDir " +
        "(a cluster-visible path) before running iterative operators")

  /** Truncate a Dataset's lineage per the configured mode (eager in both:
    * iterative callers rely on the cut plan being materialized before the
    * next round builds on it). */
  def truncate[T](ds: Dataset[T]): Dataset[T] =
    if (reliableMode(ds.sparkSession)) {
      requireDir(ds.sparkSession)
      ds.checkpoint(eager = true)
    } else ds.localCheckpoint(eager = true)

  /** Chaining spelling of [[truncate]] for operator pipelines. */
  implicit class DatasetTruncate[T](private val ds: Dataset[T]) extends AnyVal {
    def truncateLineage: Dataset[T] = truncate(ds)
  }

  /** RDD spelling: marks the RDD (persist+checkpoint in reliable mode —
    * the persist keeps the checkpoint write from recomputing the round);
    * the CALLER materializes with its own action, matching the trainer's
    * `truncate; count` round shape. */
  def truncateRdd[T](rdd: RDD[T]): RDD[T] = {
    val spark = SparkSession.active
    if (reliableMode(spark)) {
      requireDir(spark)
      rdd.persist(StorageLevel.MEMORY_AND_DISK)
      rdd.checkpoint()
    } else rdd.localCheckpoint()
    rdd
  }
}
