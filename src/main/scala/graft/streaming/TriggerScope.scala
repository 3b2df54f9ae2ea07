package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-trigger SQL-conf scoping for foreachBatch drains (the
  * [[StreamNovelty]] discipline, shared): shuffle width proportional to
  * the trigger's input splits (floor 4, capped at the session width) and
  * AQE off — a trigger-sized frame has nothing for AQE to re-plan, and
  * its per-stage query materialization is pure scheduling tax on a
  * ~3-job trigger (the same disease the rank loops had,
  * BENCHNOTES_r17.md §2). Both settings restore in `finally`; a genuinely
  * large trigger (many input splits) keeps the session width, so at
  * cluster scale this is a no-op exactly when width matters. */
object TriggerScope {

  def scoped[T](spark: SparkSession, b: DataFrame)(body: => T): T = {
    val sessParts = spark.sessionState.conf.numShufflePartitions
    val trigParts = math.max(4, math.min(sessParts, b.rdd.getNumPartitions * 4))
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", trigParts.toString)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
