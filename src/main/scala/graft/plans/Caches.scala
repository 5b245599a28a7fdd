package graft.plans

import org.apache.spark.sql.Dataset

/** Shared-cache materialization policy.
  *
  * Long-lived shared caches (the triple table, the edge projection, the
  * enriched-article frame) must be LEAF plans: consumers embed up to ~8
  * copies, and an un-truncated lineage costs O(copies × plan size) of eager
  * re-analysis per query (see the spark-bench-protocol notes / BENCH/
  * BASELINE.md). Two ways to get a leaf:
  *
  *  - `localCheckpoint` (default): blocks live on executors, zero extra I/O.
  *    Correct in one local JVM; on a real cluster a lost executor makes the
  *    blocks unrecoverable MID-QUERY because the lineage is gone.
  *  - reliable `checkpoint` (conf `graft.cache.reliable=true`): blocks are
  *    written to `graft.cache.checkpointDir` (HDFS/object store on a
  *    cluster) and survive executor loss — the right setting at 100 TB,
  *    costing one write+read of the cached frame.
  */
object Caches {

  /** Eagerly materialize `ds` as a leaf plan under the session's configured
    * cache-reliability policy.
    */
  def leaf[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    if (spark.conf.get("graft.cache.reliable", "false").toBoolean) {
      if (spark.sparkContext.getCheckpointDir.isEmpty)
        spark.sparkContext.setCheckpointDir(
          spark.conf.get("graft.cache.checkpointDir",
            sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-checkpoints"))
      ds.checkpoint(eager = true)
    } else ds.localCheckpoint(eager = true)
  }
}
