package graft.assembly

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curation store operations (principal curation table,
  * principal_schema.py:984-1006): per-statement curation counts attached to
  * query results, and curator anonymization at egress.
  */
object Curation {

  /** Curations per pa_hash (the Python dict loop of
    * call_handlers.py:337-354 as one aggregation). */
  def counts(curations: DataFrame): DataFrame =
    curations.groupBy("pa_hash").agg(count(lit(1)).as("n_curations"))

  /** Salted-MD5 curator anonymization (indra_db_service/api.py:636-639). */
  def anonymizeCurator(curator: Column, salt: String): Column =
    md5(concat(lit(salt), curator))

  /** Attach curation counts to a hash-keyed result set (left join; absent
    * means zero). */
  def attach(results: DataFrame, curations: DataFrame): DataFrame =
    results.join(
      counts(curations).withColumnRenamed("pa_hash", "mk_hash"),
      Seq("mk_hash"), "left")
      .withColumn("n_curations", coalesce(col("n_curations"), lit(0L)))
}
