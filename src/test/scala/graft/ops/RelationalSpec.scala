package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** connectedComponents must converge in O(log diameter) rounds (pointer
  * jumping) — a long chain is the adversarial case for plain label
  * propagation — and must refuse to return non-converged labels. */
class RelationalSpec extends SparkSpec {

  private def chain(n: Int) = {
    import spark.implicits._
    (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a_id", "b_id")
  }

  test("a 300-hop chain converges within the default 25 iterations (log d, not d)") {
    val cc = Relational.connectedComponents(chain(300))
    val rows = cc.collect()
    assert(rows.length == 300)
    assert(rows.forall(_.getLong(1) == 0L), "every node labels to the component min")
    assert(rows.forall(_.getLong(2) == 300L))
  }

  test("two components keep distinct min labels") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val m = Relational.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) == (1L, 3L) && m(2L) == (1L, 3L) && m(3L) == (1L, 3L))
    assert(m(10L) == (10L, 2L) && m(11L) == (10L, 2L))
  }

  test("non-convergence throws instead of returning split labels") {
    val e = intercept[IllegalStateException] {
      Relational.connectedComponents(chain(100), maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
