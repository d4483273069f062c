package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation. AQE's skew-join handling (enabled in GraftSession)
  * covers sort-merge joins at runtime; these operators cover the cases AQE
  * doesn't: a hot-key aggregation whose single reducer becomes the
  * straggler, and a broadcast-infeasible join against a skewed key column.
  */
object Skew {

  /** Two-stage salted aggregation for additive aggregates: rows scatter
    * across `salts` sub-keys (partial agg per sub-key), then the partials
    * combine per real key. The hot key's work spreads over `salts` reducers
    * at the cost of one extra (tiny) shuffle of partials.
    *
    * `aggs` maps output column name -> (stage1 agg of input col, stage2
    * combiner of the partial col). sum/count/min/max all fit (count
    * combines with sum).
    */
  def saltedAggregate(
      df: DataFrame,
      key: String,
      salts: Int,
      aggs: Map[String, (Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val stage1 = salted
      .groupBy(col(key), col("_salt"))
      .agg(aggs.head._2._1.as("_p_" + aggs.head._1),
        aggs.tail.map { case (n, (a, _)) => a.as("_p_" + n) }.toSeq: _*)
    stage1
      .groupBy(col(key))
      .agg(aggs.head._2._2(col("_p_" + aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, (_, c)) => c(col("_p_" + n)).as(n) }.toSeq: _*)
  }

  /** Salted equi-join for a skewed LEFT side against a non-broadcastable
    * right side: left rows get a random salt in [0, salts), the right side
    * replicates `salts` times, and the join key becomes (key, salt) — the
    * hot key's rows land on `salts` different reducers.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      key: String, salts: Int): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val saltDim = (0 until salts).toDF("_salt")
    val l = left.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val r = right.join(broadcast(saltDim))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
