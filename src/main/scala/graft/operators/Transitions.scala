package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-key event sequences:
  * for every ordered pair of consecutive states, the transition count and
  * the MLE conditional probability P(next | current).
  *
  * Plan shape: one hash shuffle on the sequence key + partition-local
  * sort for the `lead` window, then a partially-aggregated count on the
  * (state, next_state) pair. The per-state normalizer runs as a second
  * window over the *aggregated* pairs — at most |states|² rows, driver-
  * free regardless of input size. The raw sequence crosses the network
  * exactly once.
  */
object Transitions {

  /** `keyCol` scopes the sequences (transitions never cross keys);
    * `orderCols` is a total order within a key (ts + unique id);
    * `stateCol` is the observed state.
    */
  def matrix(df: DataFrame, keyCol: String, orderCols: Seq[String],
             stateCol: String): DataFrame = {
    val seq = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val pairs = df
      .withColumn("_next", lead(col(stateCol), 1).over(seq))
      .where(col("_next").isNotNull)
      .groupBy(col(stateCol).as("state"), col("_next").as("next_state"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("prob",
        round(col("n") / sum(col("n")).over(Window.partitionBy(col("state"))), 6))
  }
}
