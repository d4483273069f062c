package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass compiled text-statistics kernel.
  *
  * The interpreted formulation (size/filter/array_distinct higher-order
  * lambdas over a split array, once per metric) dominated the quality
  * funnel's runtime: Spark's higher-order functions do not participate in
  * codegen and each metric re-walked the token array. This kernel makes
  * ONE pass over the raw tokens (count, distinct, stopword hits, summed
  * code-point length) plus one over the lowered tokens (per-language
  * profile hits — langId lowers the WHOLE text first, so the kernel does
  * too, preserving semantics exactly), and returns everything as one
  * struct. Ratio/argmax derivation stays in cheap scalar Column math.
  */
object TextStatsKernel {

  /** Serializable config; the hash sets rebuild lazily per executor. */
  final class Config(
      val stopwords: Seq[String],
      val profiles: Seq[Seq[String]]) extends Serializable {
    @transient lazy val stopSet: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      stopwords.foreach(s.add)
      s
    }
    @transient lazy val profileSets: Array[java.util.HashSet[String]] =
      profiles.map { ws =>
        val s = new java.util.HashSet[String]()
        ws.foreach(s.add)
        s
      }.toArray
  }

  /** Identical token stream to split(trim(text), "\\s+") in Spark:
    * UTF8String.trim strips 0x20 spaces ONLY (Java's String.trim strips
    * every char <= 0x20 — a doc ending in \n would lose a token), and
    * split runs with limit -1 so trailing empty strings survive exactly
    * as Spark's StringSplit keeps them. */
  private def toks(s: UTF8String): Array[String] =
    s.trim.toString.split("\\s+", -1)

  def stats(text: UTF8String, cfg: Config)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val raw = toks(text)
    var nStop = 0L
    var sumLen = 0L
    val uniq = new java.util.HashSet[String]()
    var i = 0
    while (i < raw.length) {
      val t = raw(i)
      uniq.add(t)
      if (cfg.stopSet.contains(t)) nStop += 1
      sumLen += t.codePointCount(0, t.length)
      i += 1
    }
    val hits = new Array[Long](cfg.profileSets.length)
    val low = toks(text.toLowerCase)
    var j = 0
    while (j < low.length) {
      val t = low(j)
      var p = 0
      while (p < hits.length) {
        if (cfg.profileSets(p).contains(t)) hits(p) += 1
        p += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](raw.length.toLong, uniq.size.toLong, nStop, sumLen,
        new GenericArrayData(hits)))
  }

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_uniq", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false),
    StructField("hits", ArrayType(LongType, containsNull = false),
      nullable = false)))
}

case class TextStats(
    child: Expression,
    stopwords: Seq[String],
    profiles: Seq[Seq[String]]) extends UnaryExpression {
  private lazy val config = new TextStatsKernel.Config(stopwords, profiles)
  override def dataType: DataType = TextStatsKernel.schema
  override def nullSafeEval(v: Any): Any =
    TextStatsKernel.stats(v.asInstanceOf[UTF8String], config)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cfg = ctx.addReferenceObj("textStatsCfg", config,
      classOf[TextStatsKernel.Config].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextStatsKernel.stats($c, $cfg)")
  }
  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}
