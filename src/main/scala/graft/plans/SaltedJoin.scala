package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted skew-join fallback for head entities (SURVEY.md §4.1; BASELINE.json
  * north star). When the dictionary side is too big to broadcast and the
  * probe side's key distribution is Zipf (a handful of entities — countries,
  * "human" — dominate), a plain shuffle join puts one key's entire probe
  * volume on one task. This utility replicates the dictionary rows of the
  * top-k hot keys across `salts` buckets and fans the probe rows of those
  * keys across the same buckets, so the hot keys' work spreads over `salts`
  * tasks.
  *
  * First line of defense is AQE's skew-join splitting
  * (spark.sql.adaptive.skewJoin.enabled, on by default); this explicit
  * variant is for when the build side must shuffle and the skew is known
  * up front — e.g. the one-hop dictionary join keyed by wd entity.
  */
object SaltedJoin {

  /** Inner equi-join `probe ⋈ dict` on `key`, hot-key salted.
    *
    * @param salts replication factor for hot keys
    * @param hotThreshold a key is "hot" when its probe count exceeds this
    */
  def join(probe: DataFrame, dict: DataFrame, key: String,
      salts: Int = 16, hotThreshold: Long = 10000, maxHotKeys: Int = 1000): DataFrame = {
    // one cheap pass to find the heavy hitters (bounded collect)
    val hot = probe.groupBy(col(key)).count()
      .filter(col("count") > hotThreshold)
      .orderBy(col("count").desc)
      .limit(maxHotKeys)
      .collect().map(_.get(0)).toSet
    if (hot.isEmpty) return probe.join(dict, Seq(key))

    val hotLit = lit(hot.toArray.map(_.toString))
    val isHotP = array_contains(hotLit, col(key).cast("string"))
    // deterministic per-row salt: hash of the whole row (stable across retries)
    val salted = probe.withColumn("__salt",
      when(isHotP, pmod(hash(struct(probe.columns.map(col): _*)), lit(salts)))
        .otherwise(lit(0)))
    val isHotD = array_contains(hotLit, col(key).cast("string"))
    val dictSalted = dict
      .withColumn("__salts",
        when(isHotD, sequence(lit(0), lit(salts - 1))).otherwise(array(lit(0))))
      .withColumn("__salt", explode(col("__salts")))
      .drop("__salts")
    salted.join(dictSalted, Seq(key, "__salt")).drop("__salt")
  }
}
