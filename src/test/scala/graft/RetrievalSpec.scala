package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curate, Dedup, TextAnalysis}

/** Semantics of the retrieval / classification / split operators beyond
  * what the DuckDB gates check: BM25 ranks by term rarity, tf, and length
  * normalization; Naive Bayes recovers planted class vocabularies and
  * breaks ties deterministically; the leakage-safe split keeps near-dup
  * clusters together and reduces to the plain hash split for singletons.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("retrieval-test")
  import spark.implicits._

  test("bm25TopK: rare-term match outranks common-term match") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha alpha alpha alpha"), // common term, high tf
      (3L, "zeta theta gamma delta"),  // no query terms
      (4L, "alpha beta zeta zeta"),
    ).toDF("doc_id", "text")
    // every doc but 3 has alpha; only 1 and 4 have beta ⇒ beta is rarer
    val qs = Seq((1L, "beta")).toDF("query_id", "qtext")
    val hits = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      qs, "query_id", "qtext", k = 10).collect()
    val ranked = hits.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(ranked.map(_._1).toSet == Set(1L, 4L)) // only beta-holders hit
    // equal tf and dl ⇒ equal score, id tie-break
    assert(ranked.head._2 == ranked.last._2)
  }

  test("bm25TopK: tf raises and length lowers the score") {
    val docs = Seq(
      (1L, "term filler filler filler"),
      (2L, "term term filler filler"),       // higher tf, same length
      (3L, "term filler filler filler filler filler filler filler"),
    ).toDF("doc_id", "text")
    val qs = Seq((1L, "term")).toDF("query_id", "qtext")
    val byId = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      qs, "query_id", "qtext", k = 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(byId(2L) > byId(1L), "higher tf must score higher")
    assert(byId(1L) > byId(3L), "longer doc must be penalized")
  }

  test("hybridRrfTopK: both-list docs fuse, micro contributions are exact") {
    // doc 1: lexical hit only; doc 2: both lists; doc 3: vector hit only.
    // e1 ⊥ e2: query embedding e2+tiny·e1 ranks 2 then 3 then (excluded 9)
    val docs = Seq(
      (1L, "needle haystack needle"),
      (2L, "needle thread"),
      (3L, "unrelated words entirely"),
    ).toDF("doc_id", "text")
    val e = (i: Int) => Array.tabulate(4)(j => if (j == i) 1f else 0f)
    val corpus = Seq(
      (1L, e(0)), (2L, e(1)), (3L, Array(0.1f, 0.9f, 0f, 0f)),
    ).toDF("id", "embedding")
    val qEmb = Seq((9L, Array(0f, 1f, 0f, 0f))).toDF("id", "embedding")
    val qs = Seq((9L, "needle")).toDF("query_id", "qtext")
    val out = TextAnalysis.hybridRrfTopK(
        docs, "doc_id", "text", qs, "query_id", "qtext",
        corpusEmb = corpus, queryEmb = qEmb, k = 10, kLex = 2, kVec = 2)
      .orderBy(col("rrf").desc, col("id").asc).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // lexical: doc 1 (tf 2) then doc 2; vector: doc 2 (cos 1) then doc 3
    def c(rank: Int) = math.round(1e9 / (60 + rank)) / 1e9
    assert(out.toSeq == Seq(
      (2L, 2L, c(2) + c(1)), // in BOTH lists: lexical #2 + vector #1
      (1L, 1L, c(1)),
      (3L, 1L, c(2))))
  }

  test("bpeTrain matches an independent single-node reference for 6 merges") {
    // reference implementation: plain Seq-of-symbols merge loop, written
    // against Sennrich et al.'s description, sharing no code with the
    // engine (greedy-left merge application, lexicographic tie-break)
    def refBpe(corpus: Seq[Seq[String]], iters: Int)
        : (Seq[(String, String, Long)], Seq[Seq[String]]) = {
      var docs = corpus
      val out = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
      for (_ <- 1 to iters) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        docs.foreach(d => d.zip(d.drop(1)).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + 1))
        if (counts.nonEmpty) {
          val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
          out += ((l, r, c))
          docs = docs.map { d =>
            val b = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < d.length) {
              if (i + 1 < d.length && d(i) == l && d(i + 1) == r) {
                b += l + "\u001e" + r; i += 2
              } else { b += d(i); i += 1 }
            }
            b.toSeq
          }
        }
      }
      (out.toSeq, docs)
    }
    val texts = Seq(
      "the cat sat on the mat",
      "the cat ate the cat food",
      "a cat and the cat sat",
      "the the the cat cat",
      "on the mat sat a cat")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (refMerges, refDocs) =
      refBpe(texts.map(_.split("\\s+").toSeq), iters = 6)
    val got = TextAnalysis.bpeTrain(df, "text", iterations = 6)
      .orderBy("it").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == refMerges)
    // segmentation with the learned table reproduces the reference docs
    val seg = TextAnalysis.bpeSegment(df, "doc_id", "text",
        refMerges.map(m => (m._1, m._2)))
      .orderBy("doc_id").collect()
      .map(_.getSeq[String](1).toList).toSeq
    assert(seg == refDocs.map(_.toList))
  }

  test("bpeTrainBatched: m=1 equals sequential; m=3 matches a reference") {
    val texts = Seq(
      "the cat sat on the mat",
      "the cat ate the cat food",
      "a cat and the cat sat",
      "the the the cat cat",
      "on the mat sat a cat")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // m=1: batching degenerates to the sequential algorithm exactly
    val seq6 = TextAnalysis.bpeTrain(df, "text", iterations = 6)
      .orderBy("it").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val batched1 = TextAnalysis.bpeTrainBatched(df, "text",
        rounds = 6, mergesPerRound = 1)
      .orderBy("round").collect()
      .map(r => (r.getString(2), r.getString(3), r.getLong(4))).toSeq
    assert(batched1 == seq6)

    // m=3: greedy symbol-disjoint selection per round, vs an independent
    // reference over symbol sequences
    def refBatched(corpus: Seq[Seq[String]], rounds: Int, m: Int)
        : Seq[(Int, Int, String, String, Long)] = {
      var docs = corpus
      val out = scala.collection.mutable.ListBuffer.empty[(Int, Int, String, String, Long)]
      for (round <- 1 to rounds) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        docs.foreach(d => d.zip(d.drop(1)).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + 1))
        val ordered = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }
        val used = scala.collection.mutable.Set.empty[String]
        val acc = ordered.filter { case ((l, r), _) =>
          if (used(l) || used(r)) false
          else { used += l; used += r; true }
        }.take(m)
        acc.zipWithIndex.foreach { case (((l, r), c), k) =>
          out += ((round, k + 1, l, r, c))
        }
        acc.foreach { case ((l, r), _) =>
          docs = docs.map { d =>
            val b = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < d.length) {
              if (i + 1 < d.length && d(i) == l && d(i + 1) == r) {
                b += l + "\u001e" + r; i += 2
              } else { b += d(i); i += 1 }
            }
            b.toSeq
          }
        }
      }
      out.toSeq
    }
    val ref = refBatched(texts.map(_.split("\\s+").toSeq), rounds = 2, m = 3)
    val got = TextAnalysis.bpeTrainBatched(df, "text",
        rounds = 2, mergesPerRound = 3)
      .orderBy("round", "rank").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    assert(got == ref)
  }

  test("bpe merges export/load round-trips in the standard wire format") {
    val texts = Seq(
      "the cat sat on the mat",
      "the cat ate the cat food",
      "the the the cat cat")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val trained = TextAnalysis.bpeTrain(df, "text", iterations = 4)
      .orderBy("it").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val path = java.nio.file.Files.createTempDirectory("graft-bpe")
      .resolve("merges.txt").toString
    TextAnalysis.bpeExportMerges(trained, path)
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path))
    assert(lines.get(0).startsWith("#version"))
    assert(lines.size == 5 && !lines.get(1).contains("\u001e"))
    val loaded = TextAnalysis.bpeLoadMerges(path)
    assert(loaded ==
      trained.map { case (l, r) =>
        (TextAnalysis.bpeRender(l), TextAnalysis.bpeRender(r)) })
    // rendered-mode application of the loaded file segments identically
    // (modulo rendering) to internal-mode application of the live table
    val internal = TextAnalysis.bpeSegment(df, "doc_id", "text", trained)
      .orderBy("doc_id").collect()
      .map(_.getSeq[String](1).map(TextAnalysis.bpeRender).toList).toSeq
    val rendered = TextAnalysis
      .bpeSegmentRendered(df, "doc_id", "text", loaded)
      .orderBy("doc_id").collect()
      .map(_.getSeq[String](1).toList).toSeq
    assert(rendered == internal)
  }

  test("bpeTrainChars matches a single-node word-dictionary reference") {
    // canonical Sennrich reference: word-frequency dict, char symbols,
    // weighted pair counts, greedy-left merge — independent of the engine
    def refBpeChars(words: Seq[(String, Long)], iters: Int,
        extra: Seq[String] = Nil)
        : Seq[(String, String, Long)] = {
      var dict: Seq[(List[String], Long)] =
        words.map { case (w, c) => (w.map(_.toString).toList ++ extra, c) }
      val out = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
      for (_ <- 1 to iters) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        dict.foreach { case (syms, c) =>
          syms.zip(syms.drop(1)).foreach(p =>
            counts(p) = counts.getOrElse(p, 0L) + c)
        }
        if (counts.nonEmpty) {
          val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
          out += ((l, r, c))
          dict = dict.map { case (syms, cc) =>
            val b = scala.collection.mutable.ListBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                b += l + "\u001e" + r; i += 2
              } else { b += syms(i); i += 1 }
            }
            (b.toList, cc)
          }
        }
      }
      out.toSeq
    }
    val texts = Seq(
      "lower lowest newer newest low new",
      "wider widest lower newer",
      "low low lower newest")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val wordCounts = texts.flatMap(_.split("\\s+")).groupBy(identity)
      .map { case (w, ws) => (w, ws.length.toLong) }.toSeq
    val ref = refBpeChars(wordCounts, iters = 8)
    val got = TextAnalysis.bpeTrainChars(df, "text", iterations = 8)
      .orderBy("it").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == ref)
    // subword sanity: the frequent suffix pairs merge early
    assert(ref.take(3).map(m => m._1 + m._2).exists(s => s.contains("e")))

    // end-of-word marker: the same reference with a terminal </w> symbol
    // per word; the learned word-final units differ from word-internal
    val refEnd = refBpeChars(
      wordCounts.map { case (w, c) => (w, c) }, iters = 8,
      extra = Seq(TextAnalysis.BpeEndOfWord))
    val gotEnd = TextAnalysis.bpeTrainChars(df, "text", iterations = 8,
        markEnd = true)
      .orderBy("it").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(gotEnd == refEnd)
    assert(gotEnd != got) // the marker genuinely changes the vocabulary
    assert(gotEnd.exists { case (l, r, _) =>
      (l + r).contains(TextAnalysis.BpeEndOfWord) })

    // char-level segmentation applies the learned table per word with no
    // shuffle; verify against a direct per-word reference application
    def applyRef(word: Seq[String], ms: Seq[(String, String)]): List[String] =
      ms.foldLeft(word.toList) { case (syms, (l, r)) =>
        val b = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            b += l + "\u001e" + r; i += 2
          } else { b += syms(i); i += 1 }
        }
        b.toList
      }
    val seg = TextAnalysis.bpeSegmentChars(df, "doc_id", "text",
        gotEnd.map(m => (m._1, m._2)), markEnd = true)
      .orderBy("doc_id").collect()
      .map(_.getSeq[String](1).toList).toSeq
    val refSeg = texts.map(_.split("\\s+").toList.flatMap(w =>
      applyRef(w.map(_.toString) :+ TextAnalysis.BpeEndOfWord,
        gotEnd.map(m => (m._1, m._2)))))
    assert(seg == refSeg)
  }

  test("bpeTrainCharsToVocab: merge count derived from the vocab contract") {
    val texts = Seq(
      "lower lowest newer newest low new",
      "wider widest lower newer",
      "low low lower newest")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val init = TextAnalysis.bpeInitialVocabChars(df, "text")
    // the distinct characters of the corpus, counted independently
    assert(init ==
      texts.flatMap(_.split("\\s+")).flatten.distinct.length.toLong)
    val toVocab = TextAnalysis
      .bpeTrainCharsToVocab(df, "text", targetVocab = init + 5)
      .orderBy("it").collect()
    // exactly target - init merges, identical to the iteration form, and
    // the running vocab_size accounts init + ordinal
    val plain = TextAnalysis.bpeTrainChars(df, "text", iterations = 5)
      .orderBy("it").collect()
    assert(toVocab.length == 5)
    assert(toVocab.map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSeq ==
      plain.map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq)
    assert(toVocab.map(_.getLong(4)).toSeq ==
      (1 to 5).map(init + _.toLong))
    // a target at/under the initial vocabulary trains nothing
    assert(TextAnalysis.bpeTrainCharsToVocab(df, "text", init).count() == 0)
    // the marker variant counts </w> in the initial vocabulary
    assert(TextAnalysis.bpeInitialVocabChars(df, "text", markEnd = true)
      == init + 1)
  }

  test("tokensMixed: CJK singles out, spaced scripts unchanged") {
    val df = Seq(
      (1L, "hello big world"),
      (2L, "中文测试 ok"),
      (3L, "カタana mix"),
      (4L, "")).toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.tokensMixed(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got(1L) == List("hello", "big", "world")) // == tokens()
    assert(got(2L) == List("中", "文", "测", "试", "ok"))
    assert(got(3L) == List("カ", "タ", "ana", "mix"))
    assert(got(4L) == List("")) // same degenerate shape as tokens()
  }

  test("bpeTrainCharsChained: segmented == unchained, exhaustion-safe, 4096+ vocab") {
    val texts = Seq(
      "lower lowest newer newest low new",
      "wider widest lower newer",
      "low low lower newest")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("it").collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // chaining is EXACT: 12 merges in segments of 5 (boundaries at 5 and
    // 10) equal one unchained call, including the merge numbering
    assert(rows(TextAnalysis.bpeTrainCharsChained(df, "text", 12,
      segmentSize = 5)) == rows(TextAnalysis.bpeTrainChars(df, "text", 12)))
    // a request far past exhaustion crosses segment boundaries without
    // error and stops when pairs run out (every word one symbol)
    val deep = rows(TextAnalysis.bpeTrainCharsChained(df, "text", 5000))
    assert(deep.nonEmpty && deep.size < 5000)
    assert(deep.map(_._1) == (1 to deep.size)) // continuous numbering
    assert(deep == rows(TextAnalysis.bpeTrainCharsChained(df, "text",
      deep.size, segmentSize = 7))) // exhaustion result == exact-depth run
    // production depth: a wide-alphabet corpus (4000 distinct chars)
    // trains past a 4096 vocabulary via chaining, identical to the
    // unchained run at the same depth
    val wide = (0 until 1100).map { i =>
      val w = (0 until 4).map(k => (0x4e00 + (i * 4 + k) % 4000).toChar)
      (i.toLong, w.mkString)
    }.toDF("doc_id", "text")
    val initW = TextAnalysis.bpeInitialVocabChars(wide, "text")
    assert(initW == 4000L)
    val chainedW = rows(TextAnalysis.bpeTrainCharsChained(wide, "text", 120,
      segmentSize = 50)) // segments at 50 and 100
    assert(chainedW.size == 120)
    assert(initW + chainedW.size >= 4096) // final vocab past 4096
    assert(chainedW == rows(TextAnalysis.bpeTrainChars(wide, "text", 120)))
  }

  test("bpe sampled training segments the full corpus within a bounded delta") {
    // the law the sampled path must satisfy: merges learned from a
    // deterministic hash-sample, applied to the FULL corpus, land within
    // a small token-count delta of full-corpus training (pair statistics
    // concentrate in the head of the word distribution)
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val iters = 12
    val full = TextAnalysis.bpeTrainChars(docs, "text", iters)
      .orderBy("it").collect().map(r => (r.getString(1), r.getString(2)))
    val sampled = TextAnalysis
      .bpeTrainCharsSampled(docs, "text", iters, sampleMod = 4)
      .orderBy("it").collect().map(r => (r.getString(1), r.getString(2)))
    assert(sampled.length == iters)
    def totalTokens(ms: Seq[(String, String)]): Long =
      TextAnalysis.bpeSegmentChars(docs, "doc_id", "text", ms)
        .agg(sum(col("n_symbols"))).collect().head.getLong(0)
    val nFull = totalTokens(full.toSeq)
    val nSampled = totalTokens(sampled.toSeq)
    // sampled-trained merges compress the full corpus nearly as well
    assert(nSampled >= nFull * 95 / 100 && nSampled <= nFull * 105 / 100,
      s"full=$nFull sampled=$nSampled")
    // determinism: the hash sample is stable run to run
    val again = TextAnalysis
      .bpeTrainCharsSampled(docs, "text", iters, sampleMod = 4)
      .orderBy("it").collect().map(r => (r.getString(1), r.getString(2)))
    assert(again.toSeq == sampled.toSeq)
  }

  test("naive bayes recovers planted class vocabularies") {
    val train = Seq(
      ("spark shuffle partition executor", "eng"),
      ("shuffle codegen partition stage", "eng"),
      ("gradient loss epoch optimizer", "ml"),
      ("loss batch epoch learning", "ml"),
    ).toDF("text", "label")
    val (tc, cs) = TextAnalysis.nbTrain(train, "text", "label")
    val test_ = Seq(
      (1L, "partition shuffle stage"),
      (2L, "epoch gradient loss"),
    ).toDF("doc_id", "text")
    val pred = TextAnalysis.nbPredict(test_, "doc_id", "text", tc, cs, 1024L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred"))
      .toMap
    assert(pred(1L) == "eng")
    assert(pred(2L) == "ml")
  }

  test("naive bayes: unseen-vocab doc falls to prior, label-asc tie-break") {
    val train = Seq(
      ("aaa bbb", "x"),
      ("ccc ddd", "y"),
    ).toDF("text", "label")
    val (tc, cs) = TextAnalysis.nbTrain(train, "text", "label")
    // both classes: equal priors, equal token mass ⇒ identical scores on
    // an out-of-vocabulary doc; argmax must break on label asc
    val pred = TextAnalysis.nbPredict(
      Seq((1L, "zzz qqq")).toDF("doc_id", "text"), "doc_id", "text",
      tc, cs, 1024L).collect()
    assert(pred.length == 1 && pred.head.getAs[String]("pred") == "x")
  }

  test("char-gram NB langid: diagonal confusion on a multi-script corpus; " +
    "funnel accepts the NB scorer where profiles answer und") {
    import graft.operators.Curate
    // escape-coded multi-script fixtures (Cyrillic / Han / kana / Latin)
    val ru = "\u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440 \u043a\u0430\u043a \u0434\u0435\u043b\u0430"
    val zh = "\u5929\u5730\u7384\u9ec4\u5b87\u5b99\u6d2a\u8352"
    val ja = "\u3044\u308d\u306f\u306b\u307b\u3078\u3068\u3061\u308a\u306c\u308b\u3092"
    val en = "the quick brown fox jumps over the lazy dog"
    val corpus = (0 until 40).map { i =>
      val (t, l) = (i % 4) match {
        case 0 => (en, "en")
        case 1 => (ru, "ru")
        case 2 => (zh, "zh")
        case _ => (ja, "ja")
      }
      (i.toLong, s"$t num $i", l)
    }.toDF("doc_id", "text", "lang")
    // train on half the ids, decorrelated from the % 4 class
    val model = TextAnalysis.langIdNbTrain(
      corpus.filter(col("doc_id") % 8 < 4).select("text", "lang"),
      "text", "lang")
    val pred = TextAnalysis.langIdNbPredict(corpus, "doc_id", "text", model)
    // confusion matrix: strictly diagonal (every script classified right)
    val confusion = pred.join(corpus.select("doc_id", "lang"), "doc_id")
      .groupBy("lang", "pred").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(confusion.keySet == Set(("en", "en"), ("ru", "ru"),
      ("zh", "zh"), ("ja", "ja")), s"off-diagonal: $confusion")
    assert(confusion.values.sum == 40)
    // the langid model merges like any NB model (incremental serving)
    val merged = TextAnalysis.nbMerge(
      TextAnalysis.langIdNbTrain(corpus.filter(col("doc_id") % 4 < 2)
        .filter(col("doc_id") % 8 < 4).select("text", "lang"),
        "text", "lang"),
      TextAnalysis.langIdNbTrain(corpus.filter(col("doc_id") % 4 >= 2)
        .filter(col("doc_id") % 8 < 4).select("text", "lang"),
        "text", "lang"))
    val mergedPred = TextAnalysis.langIdNbPredict(corpus, "doc_id", "text",
        merged)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fullPred = pred.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(mergedPred == fullPred)
    // the quality funnel accepts the NB scorer as its language stage:
    // profile-hit langId answers "und" for every non-Latin script (no
    // curated stopword list), so a Russian-language pipeline MUST use
    // the learned path — same filterFunnel, different keep column
    val withBoth = corpus
      .withColumn("lang_profile", TextAnalysis.langId(col("text")))
      .join(pred.select(col("doc_id"), col("pred").as("lang_nb")),
        "doc_id")
    assert(withBoth.filter(col("lang") === "ru")
      .select("lang_profile").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("und"))
    val funnel = Curate.filterFunnel(withBoth, Seq(
      Curate.FilterStage("lang", col("lang_nb") === "ru")))
    val keptIds = funnel.filter(col("verdict") === "kept")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds == (0 until 40).filter(_ % 4 == 1).map(_.toLong).toSet)
  }

  test("naive bayes model merges exactly: train(A∪B) == merge(train(A), train(B))") {
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.001",
      "documents").select("text", "lang", "doc_id")
    val a = docs.filter(col("doc_id") % 2 === 0).select("text", "lang")
    val b = docs.filter(col("doc_id") % 2 === 1).select("text", "lang")
    val whole = TextAnalysis.nbTrain(docs.select("text", "lang"),
      "text", "lang")
    val merged = TextAnalysis.nbMerge(
      TextAnalysis.nbTrain(a, "text", "lang"),
      TextAnalysis.nbTrain(b, "text", "lang"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(merged._1) == canon(whole._1))
    assert(canon(merged._2) == canon(whole._2))
    // and the merged model classifies identically
    val test_ = docs.select("doc_id", "text")
    def preds(m: (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame)) =
      TextAnalysis.nbPredict(test_, "doc_id", "text", m._1, m._2, 65536L)
        .collect().map(_.toString).sorted.toSeq
    assert(preds(merged) == preds(whole))
  }

  test("count-min sketch: one-sided error, exact at sufficient width") {
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.001",
      "documents").select("text")
    val exact = docs.select(
        explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("exact"))
    def run(w: Int) = TextAnalysis.cmsEstimate(
        TextAnalysis.cmsBuild(docs, "text", d = 3, w = w),
        exact.select("term"), "term", d = 3, w = w)
      .join(exact, "term").collect()
      .map(r => (r.getAs[String]("term"),
        r.getAs[Long]("exact"), r.getAs[Long]("est")))
    val narrow = run(16)
    narrow.foreach { case (t, ex, est) =>
      assert(est >= ex, s"CMS UNDER-estimated $t: $est < $ex")
    }
    assert(narrow.exists { case (_, ex, est) => est > ex },
      "31 terms in 16 buckets must collide somewhere")
    // a sketch wider than the vocabulary square collides nowhere under
    // 3 independent rows — estimates become exact
    run(4096).foreach { case (t, ex, est) =>
      assert(est == ex, s"wide CMS off on $t: $est != $ex")
    }
  }

  test("leakageSafeSplit keeps near-dup clusters in one split") {
    val base = (1 to 40).map(i =>
      (i.toLong, s"w$i x$i y$i z$i a$i b$i c$i d$i e$i f$i"))
    // plant exact copies of every 4th doc (ids +1000) ⇒ guaranteed pairs
    val dups = base.filter(_._1 % 4 == 0)
      .map { case (i, t) => (i + 1000L, t) }
    val docs = (base ++ dups).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      n = 3, k = 12, r = 3, threshold = 0.6)
    val out = Curate.leakageSafeSplit(docs.select("doc_id"), "doc_id", pairs)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("root"), r.getAs[String]("split")))
    val byId = out.map(t => t._1 -> t).toMap
    // every planted dup shares root AND split with its original
    dups.foreach { case (dupId, _) =>
      val orig = byId(dupId - 1000L)
      val dup = byId(dupId)
      assert(dup._2 == orig._2 && dup._3 == orig._3,
        s"cluster ($dupId, ${dupId - 1000L}) straddles splits: $dup vs $orig")
    }
    // singletons carry their own id as root and match plain hashSplit
    val plain = Curate.hashSplit(docs.select("doc_id"), "doc_id")
      .collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    out.filter(t => t._1 == t._2).foreach { case (id, _, split) =>
      assert(split == plain(id))
    }
    // and the paired docs' splits equal the hash split of their ROOT
    out.filter(t => t._1 != t._2).foreach { case (id, root, split) =>
      assert(split == plain(root), s"doc $id: split != hashSplit(root=$root)")
    }
  }
  test("rocAuc: perfect separation is 1.0, reversal 0.0, all-ties 0.5") {
    def auc(rows: Seq[(Long, Boolean)]): (Long, Long, Long, Double) = {
      val df = rows.toDF("s", "y")
      val r = TextAnalysis.rocAuc(df, "s", "y").collect().head
      (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
        r.getAs[Long]("u2"), r.getAs[Double]("auc"))
    }
    // every positive above every negative
    assert(auc(Seq((10L, true), (9L, true), (1L, false), (2L, false)))._4
      == 1.0)
    // every positive below every negative
    assert(auc(Seq((1L, true), (2L, true), (9L, false), (10L, false)))._4
      == 0.0)
    // one score for everything: pure ties
    assert(auc(Seq((5L, true), (5L, true), (5L, false), (5L, false)))._4
      == 0.5)
  }

  test("rocAuc: tie handling matches the averaged-rank closed form") {
    // scores: pos {3, 2, 2}, neg {2, 1}. Pairs: (3,2)=1, (3,1)=1,
    // (2,2)=.5 twice, (2,1)=1 twice -> U = 5, AUC = 5 / 6
    val rows = Seq((3L, true), (2L, true), (2L, true), (2L, false),
      (1L, false))
    val r = TextAnalysis.rocAuc(rows.toDF("s", "y"), "s", "y")
      .collect().head
    assert(r.getAs[Long]("u2") == 10L)
    assert(r.getAs[Double]("auc") == 10.0 / 12.0)
  }

  test("rocAuc: label swap complements the area") {
    val rows = Seq((9L, true), (7L, false), (7L, true), (4L, false),
      (2L, true), (1L, false), (1L, false), (0L, true))
    val df = rows.toDF("s", "y")
    val a = TextAnalysis.rocAuc(df, "s", "y").collect().head
      .getAs[Double]("auc")
    val b = TextAnalysis.rocAuc(df.withColumn("y", !col("y")), "s", "y")
      .collect().head.getAs[Double]("auc")
    assert(math.abs(a + b - 1.0) < 1e-12)
  }
  test("calibrationBins: equal bins that sum back, monotone when separable") {
    // scores 1..100, positive iff score > 50: a perfectly separable scorer
    val rows = (1 to 100).map(i => (i.toLong, i.toLong, i > 50))
      .toDF("id", "s", "y")
    val bins = TextAnalysis.calibrationBins(rows, "id", "s", "y", 10)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("pos_rate")))
    assert(bins.map(_._1).toSeq == (0L to 9L))
    assert(bins.forall(_._2 == 10L))            // equal population
    assert(bins.map(_._3).sum == 50L)           // positives conserved
    assert(bins.take(5).forall(_._4 == 0.0))    // low-score bins all negative
    assert(bins.drop(5).forall(_._4 == 1.0))    // high-score bins all positive
  }
}
