package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val labeled = Seq(
    (1L, "buy buy now", "spam"),
    (2L, "buy pills", "spam"),
    (3L, "hello world", "ham"),
    (4L, "hello friend", "ham")
  ).toDF("id", "text", "label")

  test("train: smoothed likelihoods, doc priors, hand-checked scores") {
    val (model, stats) = NbClassifier.train(labeled, "text", "label")
    // vocab = 6 words; spam tokc=5, ham tokc=4; denom = tokc + (6+1)
    val m = model.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(m(("buy", "spam")) - math.log(4.0 / 12.0)) < 1e-12)
    assert(math.abs(m(("hello", "ham")) - math.log(3.0 / 11.0)) < 1e-12)
    assert(!m.contains(("hello", "spam"))) // absent pairs ride the floor
    val st = stats.collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(math.abs(st("spam")._1 - math.log(0.5)) < 1e-12)
    assert(math.abs(st("spam")._2 - math.log(1.0 / 12.0)) < 1e-12)
    assert(math.abs(st("ham")._2 - math.log(1.0 / 11.0)) < 1e-12)

    val docs = Seq((10L, "buy now"), (11L, "hello zzz"), (12L, ""))
      .toDF("doc", "text")
    val r = NbClassifier.score(docs, "doc", "text", model, stats)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getString(4))))
      .toMap
    // columns: doc, n_tokens, score_ham, score_spam (labels asc), predicted
    val (nt10, ham10, spam10, p10) = r(10L)
    assert(nt10 == 2L && p10 == "spam")
    assert(math.abs(spam10 -
      round6(math.log(0.5) + math.log(4.0 / 12.0) + math.log(2.0 / 12.0)))
      < 1e-9)
    assert(math.abs(ham10 -
      round6(math.log(0.5) + 2 * math.log(1.0 / 11.0))) < 1e-9)
    assert(r(11L)._4 == "ham") // one vocab hit for ham beats two floors
    // token-less doc: prior-only scores, tie broken to the asc-first
    // label, zero tokens
    val (nt12, ham12, spam12, p12) = r(12L)
    assert(nt12 == 0L && p12 == "ham")
    assert(math.abs(ham12 - round6(math.log(0.5))) < 1e-9 &&
      ham12 == spam12)
  }

  private def round6(d: Double): Double = math.rint(d * 1e6) / 1e6

  test("vocabSize cut is deterministic; smoothing and misuse guards") {
    // vocabSize=1 keeps only "buy" (count 3); everything else is OOV
    val (model, stats) = NbClassifier.train(labeled, "text", "label",
      vocabSize = 1)
    assert(model.collect().map(_.getString(0)).distinct.toSeq == Seq("buy"))
    // spam: tokc=3, denom=3+2=5; ham: tokc=0 (no stats row dropped)
    val st = stats.collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(st.keySet == Set("ham", "spam"))
    assert(math.abs(st("spam") - math.log(1.0 / 5.0)) < 1e-12)
    assert(math.abs(st("ham") - math.log(1.0 / 2.0)) < 1e-12)
    intercept[IllegalArgumentException](
      NbClassifier.train(labeled, "text", "label", vocabSize = 0))
    intercept[IllegalArgumentException](
      NbClassifier.train(labeled, "text", "label", smoothing = 0.0))
    intercept[IllegalArgumentException](
      NbClassifier.score(labeled.withColumnRenamed("id", "word"), "word",
        "text", model, stats))
    intercept[IllegalArgumentException](
      NbClassifier.score(labeled, "id", "text", model,
        stats.where(lit(false))))
  }

  test("null labels are excluded from training, not a class") {
    val withNull = labeled.union(
      Seq((5L, "buy buy buy", null.asInstanceOf[String]))
        .toDF("id", "text", "label"))
    val (_, stats) = NbClassifier.train(withNull, "text", "label")
    assert(stats.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("ham", "spam"))
  }

  test("language id on the synthetic corpus: beats chance and majority") {
    // the synthetic corpus draws every "language" from ONE shared
    // 31-word vocabulary — the langs differ only in word distribution,
    // so the ceiling is far below a real lang-id task. The classifier
    // must still clearly beat both chance (5 classes → 0.2) and the
    // majority-class baseline (~0.39 'en' on the train split)
    val docs = sf("documents")
    val seed = docs.where(pmod(col("doc_id"), lit(3)) === 0)
    val (model, stats) = NbClassifier.train(seed, "text", "lang",
      vocabSize = 200)
    val scored = NbClassifier.score(seed, "doc_id", "text", model, stats)
    val acc = scored.join(seed.select(col("doc_id"), col("lang")), "doc_id")
      .select(avg(when(col("predicted") === col("lang"), 1.0)
        .otherwise(0.0)).as("acc")).head.getDouble(0)
    assert(acc > 0.45, s"train-split accuracy $acc")
  }
}
