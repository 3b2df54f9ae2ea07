package graft.streaming

import graft.SparkSpec

/** TriggerScope is the conf seam every foreachBatch drain now runs
  * under — a leak (conf not restored) would silently re-plan the whole
  * SESSION at trigger width / AQE-off after the first drain. Pins:
  * restore on success AND on an exception, the scoped values inside,
  * and the session-width cap for wide inputs. */
class TriggerScopeSpec extends SparkSpec {

  private def confPair = (
    spark.conf.get("spark.sql.shuffle.partitions"),
    spark.conf.get("spark.sql.adaptive.enabled"))

  test("scoped body sees trigger width + AQE off; session conf restored after") {
    import spark.implicits._
    val before = confPair
    val b = Seq(1, 2, 3).toDF("x").coalesce(1)
    val inside = TriggerScope.scoped(spark, b)(confPair)
    assert(inside._1.toInt === 4, "1-split trigger floors at 4 shuffle partitions")
    assert(inside._2 === "false", "AQE must be off inside the scope")
    assert(confPair === before, "session conf must restore on success")
  }

  test("conf restores when the body throws") {
    import spark.implicits._
    val before = confPair
    val b = Seq(1).toDF("x")
    intercept[IllegalStateException] {
      TriggerScope.scoped(spark, b)(throw new IllegalStateException("boom"))
    }
    assert(confPair === before, "session conf must restore on failure")
  }

  test("a wide trigger keeps the session width (cluster no-op by construction)") {
    import spark.implicits._
    val sess = spark.sessionState.conf.numShufflePartitions
    val wide = Seq.tabulate(32)(i => i).toDF("x").repartition(32)
    val inside = TriggerScope.scoped(spark, wide)(
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    assert(inside === sess, s"32 input splits x4 caps at the session width $sess")
  }
}
