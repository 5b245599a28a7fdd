package graft.canon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Downward reachability closure over a (child, parent) edge list: every
  * node reachable from `seed` by repeatedly following parent→child edges.
  * Used by the kg04 isOccuringDuring closure (create_event_map.py-family
  * queries walk the topic nesting to fixpoint).
  *
  * Runs to FIXPOINT — `maxRounds` is a loud data-corruption guard, not a
  * silent truncation. Round 4 found the cost of the alternative: a fixed
  * 8-round cap (justified by "day-page nesting ≤ 4") silently dropped the
  * depth-9 tail of the sf0.1 topic graph — 3 nodes, one event, an
  * off-by-one in a monthly rollup that only a cross-SF oracle run caught.
  * Frontier rounds are O(closure diameter); each round's frame is
  * localCheckpoint'ed so the plan stays O(1) per round instead of growing
  * with the iteration count (plans.Aqe turns AQE off for the window — the
  * per-round frames are tiny and the stage barriers would dominate).
  */
object Reach {

  /** @param childParent two columns named (child, parent)
    * @param seed one column named node
    * @return one column `node`: the seed plus everything reachable below it
    */
  def closure(childParent: DataFrame, seed: DataFrame, maxRounds: Int = 64): DataFrame = {
    val s = childParent.sparkSession
    graft.plans.Aqe.without(s) {
      var reach = seed.select(col("node")).localCheckpoint(true)
      var frontier = reach
      var done = false
      var productive = 0
      while (!done) {
        val next = childParent
          .join(frontier.withColumnRenamed("node", "parent"), Seq("parent"))
          .select(col("child").as("node")).distinct()
          .join(reach, Seq("node"), "left_anti")
          .localCheckpoint(true)
        if (next.isEmpty) done = true
        else {
          productive += 1
          // guard only PRODUCTIVE rounds, so a closure of depth exactly
          // maxRounds still gets its confirming empty round and succeeds.
          // Cycles cannot trip this: the left_anti keeps every frontier
          // strictly new, so a cyclic graph still converges in <= |nodes|
          // rounds — only a graph deeper than maxRounds can.
          require(productive <= maxRounds,
            s"Reach.closure exceeded $maxRounds productive rounds — the edge " +
              "graph is deeper than any sane topic nesting; refusing to " +
              "return a silently truncated closure")
          // accumulate as a UNION OF LEAVES (every `next` is already a
          // checkpointed leaf, so nothing recomputes); checkpoint the union
          // only every 8th round to bound plan width — r6: the former
          // per-round union checkpoint was one full job per round, a third
          // of the loop's job count, purely to re-materialize rows that
          // were all in blocks already
          reach = reach.union(next)
          if (productive % 8 == 0) reach = reach.localCheckpoint(true)
          frontier = next
        }
      }
      graft.plans.Meters.set("reach.rounds", productive.toLong)
      reach
    }
  }
}
