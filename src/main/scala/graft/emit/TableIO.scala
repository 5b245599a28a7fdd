package graft.emit

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-shaped table semantics over partitioned parquet (SURVEY.md §7:
  * no Iceberg jar in the sandbox, so snapshot/manifest/REPLACE-WHERE are
  * implemented explicitly behind this small API; a real Iceberg catalog
  * drops in by replacing this object).
  *
  * Layout:
  *   table/
  *     data/<partCol>=<value>/...parquet     (one dir per partition value)
  *     _manifests/manifest-<epoch>.json      (snapshot: committed partitions
  *                                            + row counts + lineage metrics)
  *     _manifests/CURRENT                    (atomic pointer, rename-commit)
  *
  * Guarantees:
  *  - commit is atomic: data lands partition-by-partition, then one rename
  *    flips CURRENT → readers never see a half-written snapshot;
  *  - REPLACE WHERE: rewriting a partition replaces exactly that partition;
  *  - resume: `uncommitted(keys)` anti-joins the work list against the
  *    current snapshot so a killed job restarts from the last commit
  *    (reference analogue: skip-month-if-exists gate, __main__.py:286).
  */
object TableIO {

  case class PartitionMeta(key: String, rows: Long, files: Int,
      metrics: Map[String, Long] = Map.empty)
  case class Manifest(snapshotId: Long, partitions: Map[String, PartitionMeta])

  private def manifestDir(table: String): Path = Paths.get(table, "_manifests")
  private def dataDir(table: String): Path = Paths.get(table, "data")

  def currentManifest(table: String): Manifest = {
    val cur = manifestDir(table).resolve("CURRENT")
    if (!Files.exists(cur)) Manifest(0L, Map.empty)
    else readManifest(manifestDir(table).resolve(Files.readString(cur).trim))
  }

  private def readManifest(p: Path): Manifest = {
    // minimal line-oriented format: snapshotId then one line per partition
    val lines = Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq
    val sid = lines.head.toLong
    val parts = lines.tail.map { l =>
      val f = l.split("\t", -1)
      val metrics =
        if (f.length > 3 && f(3).nonEmpty)
          f(3).split(";").map { kv =>
            val Array(k, v) = kv.split("=", 2); k -> v.toLong
          }.toMap
        else Map.empty[String, Long]
      f(0) -> PartitionMeta(f(0), f(1).toLong, f(2).toInt, metrics)
    }.toMap
    Manifest(sid, parts)
  }

  private def writeManifest(table: String, m: Manifest): Unit = {
    val dir = manifestDir(table)
    Files.createDirectories(dir)
    val name = s"manifest-${m.snapshotId}"
    val body = (Seq(m.snapshotId.toString) ++
      m.partitions.values.toSeq.sortBy(_.key)
        .map { p =>
          val ms = p.metrics.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(";")
          s"${p.key}\t${p.rows}\t${p.files}\t$ms"
        }).mkString("\n")
    val tmp = dir.resolve(name + ".tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    val curTmp = dir.resolve("CURRENT.tmp")
    Files.writeString(curTmp, name)
    // the atomic rename IS the commit
    Files.move(curTmp, dir.resolve("CURRENT"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Partition keys in the work list that the current snapshot has not
    * committed yet — the resume anti-join.
    */
  def uncommitted(table: String, keys: Seq[String]): Seq[String] = {
    val done = currentManifest(table).partitions.keySet
    keys.filterNot(done.contains)
  }

  /** REPLACE-WHERE write: materialize exactly the given partitions of `df`
    * (partitioned by `partCol`), replacing any previous version of those
    * partitions, then commit a new snapshot covering old ∪ new. Lineage
    * metrics are recorded per partition in the manifest: the row count plus
    * whatever counters `metricsFn` derives from the (persisted) slice —
    * called after the write so the counters read the cache, not a recompute.
    */
  def replacePartitions(spark: SparkSession, table: String, df: DataFrame,
      partCol: String, keys: Seq[String],
      metricsFn: DataFrame => Map[String, Map[String, Long]] = _ => Map.empty): Manifest = {
    val prev = currentManifest(table)
    val slice = df.filter(col(partCol).isin(keys: _*))
      // align the write exchange with the partition spec
      .repartition(col(partCol))
      // ONE pipeline compute per commit: the write materializes the cache,
      // the lineage-count pass below reads it back instead of recomputing
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    slice.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partCol)
      .option("partitionOverwriteMode", "dynamic")
      .parquet(dataDir(table).toString)
    val counts = slice.groupBy(partCol).count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    val lineage = metricsFn(slice)
    slice.unpersist(blocking = false)
    // dynamic overwrite leaves untouched any requested partition that had no
    // rows this time — drop its stale directory so snapshot and data agree
    for (k <- keys if counts.getOrElse(k, 0L) == 0L) {
      val dir = dataDir(table).resolve(s"$partCol=$k")
      if (Files.exists(dir)) {
        Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      }
    }
    val newParts = keys.map { k =>
      k -> PartitionMeta(k, counts.getOrElse(k, 0L), 1, lineage.getOrElse(k, Map.empty))
    }.toMap
    val m = Manifest(prev.snapshotId + 1, prev.partitions ++ newParts)
    writeManifest(table, m)
    m
  }

  /** Read the committed snapshot (only partitions listed in the manifest). */
  def read(spark: SparkSession, table: String, partCol: String): DataFrame = {
    val m = currentManifest(table)
    require(m.partitions.nonEmpty, s"no committed snapshot in $table")
    spark.read.option("basePath", dataDir(table).toString)
      .parquet(dataDir(table).toString)
      .filter(col(partCol).isin(m.partitions.keySet.toSeq: _*))
  }
}
