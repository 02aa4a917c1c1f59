package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot maintenance: apply a change batch to a keyed snapshot — the
  * open-source-Spark spelling of `MERGE INTO` (no table format needed):
  *
  *   result =   snapshot ANTI-JOIN changes (by key)     -- untouched rows
  *            ∪ changes WHERE op != 'delete'            -- new versions
  *
  * An 'update' replaces the keyed row wholesale, an 'insert' adds a new
  * key, a 'delete' removes one — uniform handling because the anti join
  * drops EVERY changed key from the snapshot and the union re-adds only
  * the surviving versions. Change keys must be unique (latest-change
  * compaction is the upstream `dedup`-by-key step).
  *
  * Scale shape: ONE shuffle, keyed by the merge key, on both sides — at
  * 100 TB the snapshot is stored bucketed by that key
  * ([[BucketedSink]]), which makes the anti join zero-exchange on the
  * snapshot side; the change batch is daily-sized and either broadcasts
  * or co-buckets. This is the standard periodic-rewrite merge; row-level
  * formats (Delta/Iceberg) optimize the write side, not this plan shape.
  */
object Upsert {

  /** `changes` carries the snapshot's columns plus `opCol` in
    * {'insert','update','delete'}; keys in `changes` must be unique. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    val survivors = changes.filter(col(opCol) =!= "delete").drop(opCol)
    snapshot.join(changes.select(col(key)), Seq(key), "left_anti")
      .unionByName(survivors)
  }
}
