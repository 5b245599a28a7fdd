package graft.kg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.emit.TableIO

/** Writes the triple table as date-partitioned parquet with snapshot commits
  * (north rule: "(subj, pred, obj) Iceberg partitions keyed by event date …
  * per-partition checkpointing, lineage records, and resumability so a
  * killed job restarts from the last committed snapshot").
  *
  * Work is committed month-by-month (the reference's month loop,
  * __main__.py:253-345): each month's date partitions are computed, written
  * via REPLACE WHERE and committed atomically. On restart, committed dates
  * are pruned from the work list BEFORE parsing — the day-page scan itself
  * shrinks, not just the write.
  */
object Materialize {

  def datesOfMonth(p: Synth.Params, year: Int, month: Int): Seq[String] =
    Synth.allDaysOf(p).filter(x => x._1 == year && x._2 == month)
      .map { case (y, m, d) => f"$y%04d-$m%02d-$d%02d" }

  /** Run (or resume) the materialization. Returns committed partition count.
    * @param maxMonths stop after this many months (for kill/restart tests)
    */
  def run(spark: SparkSession, sfDir: String, table: String,
      maxMonths: Int = Int.MaxValue): Int = {
    val p = Synth.paramsFor(sfDir)
    var committed = 0
    var monthsDone = 0
    for (year <- p.year until (p.year + p.years);
         month <- 1 to p.months if monthsDone < maxMonths) {
      monthsDone += 1
      val dates = datesOfMonth(p, year, month)
      val todo = TableIO.uncommitted(table, dates)
      if (todo.nonEmpty) {
        val (triples, intermediates) =
          Pipeline.triplesTracked(spark, p, Some(todo.toSet))
        TableIO.replacePartitions(spark, table, triples.toDF(), "event_date", todo)
        intermediates.foreach(_.unpersist(blocking = false)) // month committed
        committed += todo.size
      }
    }
    committed
  }
}
