package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * The dot product / norm folds use `aggregate` over the array — a
  * sequential, codegen'd fold in array order, so float->double math is
  * bit-reproducible across engines (an explode+SUM would not be: shuffle
  * order changes float addition).
  *
  * Scale path: brute force is O(n²) in candidate pairs; `signBuckets`
  * provides the LSH route — deterministic ±1 hyperplanes bucket vectors by
  * sign pattern, confining the quadratic join to same-bucket groups (the
  * same blocking idea an IVF index applies with learned centroids).
  */
object Similarity {

  /** Sequential fold dot product of two equal-length float arrays, in
    * double — compiled kernel (graft.functions.FloatDot); identical bits
    * to the interpreted `aggregate(zip_with(...))` fold. */
  def dot(a: Column, b: Column): Column =
    graft.functions.vectors.float_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k neighbors for each query row. `queries` and
    * `corpus` need (id, embedding); block the corpus beforehand if O(|q|·|c|)
    * is too large. Norms are computed once per vector (not per pair) —
    * O(n·d) instead of O(n²·d) norm work. Scores rounded to `scale` for
    * deterministic ranking with id tie-breaks. */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int, scale: Int = 4): DataFrame = {
    val q = queries.select(col("id").as("q_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_nrm"))
    val c = corpus.select(col("id").as("c_id"), col("embedding").as("c_emb"),
      norm(col("embedding")).as("c_nrm"))
    val scored = q.join(c, col("q_id") =!= col("c_id"))
      .withColumn("cos", round(
        dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), scale))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rn").cast("long").as("rn"))
  }

  /** Sign-LSH bucket id from `planes` hyperplanes: bit p set iff
    * dot(v, plane_p) > 0. Compiled kernel (graft.functions.SignLshBucket);
    * `dim` is taken from the array itself. */
  def signBucket(emb: Column, planes: Int, dim: Int): Column =
    graft.functions.vectors.sign_lsh_bucket(emb, planes)

  /** Same-bucket candidate pairs with exact cosine — the scale path for
    * near-neighbor pairs. */
  def lshPairs(
      vectors: DataFrame, planes: Int, dim: Int,
      minCos: Double, scale: Int = 4): DataFrame = {
    val b = vectors.select(col("id"), col("embedding"),
      signBucket(col("embedding"), planes, dim).as("bucket"),
      norm(col("embedding")).as("nrm")) // once per vector, not per pair
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .withColumn("cos", round(
        dot(col("x.embedding"), col("y.embedding")) /
          (col("x.nrm") * col("y.nrm")), scale))
      .filter(col("cos") >= minCos)
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"), col("cos"))
  }
}
