package graft.plans

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CachesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reliable mode writes a full copy of the frame to the checkpoint store
    * and Spark never deletes it on its own (cleanCheckpoints defaults false,
    * nothing runs at context stop) — Caches.free must, or every rebuild
    * cycle grows the store by the cached dataset.
    */
  test("free() deletes reliable checkpoint files; localCheckpoint mode is a no-op on disk") {
    import spark.implicits._
    val ckDir = Files.createTempDirectory("graft_ck").toString
    spark.conf.set("graft.cache.reliable", "true")
    spark.conf.set("graft.cache.checkpointDir", ckDir)
    try {
      val leafed = Caches.leaf((1 to 100).toDF("n"))
      assert(leafed.count() == 100)
      def parquetless(dir: java.io.File): Seq[java.io.File] =
        Option(dir.listFiles()).toSeq.flatten
          .flatMap(f => if (f.isDirectory) parquetless(f) else Seq(f))
      val before = parquetless(new java.io.File(ckDir))
      assert(before.nonEmpty, "reliable leaf must write checkpoint files")
      Caches.free(leafed)
      val after = parquetless(new java.io.File(ckDir))
      assert(after.isEmpty,
        s"free() must delete the ReliableCheckpointRDD files, found: $after")
    } finally {
      spark.conf.unset("graft.cache.reliable")
      spark.conf.unset("graft.cache.checkpointDir")
    }
  }

  test("local mode: free() unpersists the leaf's checkpointed RDD") {
    import spark.implicits._
    val leafed = Caches.leaf((1 to 50).toDF("n"))
    assert(leafed.count() == 50)
    val rdd = leafed.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.head
    assert(rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "localCheckpoint leaf must be persist-backed")
    Caches.free(leafed)
    // RDD.unpersist resets the declared level synchronously (block removal
    // is async with blocking=false, but the level is the contract here)
    assert(rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }
}
