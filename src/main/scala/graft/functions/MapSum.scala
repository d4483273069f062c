package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Pointwise sum of Map[String,Long] columns — the source-count Counter
  * merge (export_assembly.py:517-535 / RelationSQL's src-dict merge,
  * query.py:130-203) as a typed Aggregator: per-partition partial maps
  * combine map-side, so the shuffle carries one small map per group per
  * partition instead of exploded (key, value) rows.
  */
object MapSum extends Aggregator[Map[String, Long], Map[String, Long], Map[String, Long]] {
  def zero: Map[String, Long] = Map.empty

  def reduce(acc: Map[String, Long], m: Map[String, Long]): Map[String, Long] =
    merge(acc, m)

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
  }

  def finish(acc: Map[String, Long]): Map[String, Long] = acc

  def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  /** Column form: `map_sum(src_json)` inside any groupBy().agg(...). */
  val column: org.apache.spark.sql.expressions.UserDefinedFunction = udaf(MapSum)
  def map_sum(c: Column): Column = column(c)
}
