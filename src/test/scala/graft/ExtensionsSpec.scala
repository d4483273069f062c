package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Content, Tables}

/** SQL registration of custom expressions via SparkSessionExtensions, and
  * zlib content round-trip through the mapPartitions decompressor.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("ext-test")

  test("custom expressions are callable from SQL") {
    val r = spark.sql(
      "SELECT stable_hash64('abc') AS h, poly_hash('abc') AS p").collect().head
    assert(r.getLong(0) == -8070080442485551184L)
    // fold: ((0*31+97)%M*31+98)%M*31+99 = 97*961 + 98*31 + 99
    assert(r.getLong(1) == (97L * 31 * 31 + 98L * 31 + 99L))
    val dot = spark.sql(
      "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(dot == 11.0)
  }

  test("zlib content decompression round-trips the documents corpus") {
    import spark.implicits._
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    // compress per-partition (the form the principal store keeps), then
    // run the real decompress path and compare
    val compressed = docs.as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        (id, Content.deflate(t.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }).toDF("doc_id", "content")
    val restored = Content.decompress(compressed, "doc_id", "content")
    val diff = restored.join(docs.withColumnRenamed("text", "orig"), "doc_id")
      .filter(col("text") =!= col("orig")).count()
    assert(diff == 0)
    assert(restored.count() == docs.count())
  }
}
