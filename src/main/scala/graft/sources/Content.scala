package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}

/** Compressed text-content handling — the reference stores article text as
  * zlib-compressed BYTEA (`text_content.content`, principal_schema.py:417-437)
  * and decompresses at read time. Decompression is per-partition imperative
  * work (a genuine mapPartitions case: a streaming Inflater per batch, no
  * codegen equivalent), producing the plain-text column for the readers.
  */
object Content {

  def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(bytes); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  def inflate(bytes: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(bytes)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) sys.error("truncated zlib stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** (id, compressed-content) -> (id, text). One Inflater per row batch,
    * partition-local; the decompressed text never moves compressed. */
  def decompress(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = df
      .selectExpr(s"CAST($idCol AS BIGINT)", contentCol)
      .as[(Long, Array[Byte])]
    ds.mapPartitions(_.map { case (id, bytes) =>
      (id, new String(inflate(bytes), java.nio.charset.StandardCharsets.UTF_8))
    }).toDF(idCol, "text")
  }
}
