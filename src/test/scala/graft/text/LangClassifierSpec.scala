package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** P54 learning gate: the synthetic corpus's lang labels are content-
  * independent, so THIS fixture is where the classifier must prove it
  * learns — real en/fr/de/es sentences (function-word-heavy public
  * text), held-out accuracy ≥ 0.9. */
class LangClassifierSpec extends SparkSpec {
  import spark.implicits._

  // short natural-language snippets, 12 per language; function words and
  // orthography (accents, ß, digraphs) carry the char-n-gram signal
  private val corpus: Seq[(String, String)] = Seq(
    "en" -> "the quick brown fox jumps over the lazy dog near the river bank",
    "en" -> "she said that it would be better to wait for the morning train",
    "en" -> "there is nothing more important than the health of the people",
    "en" -> "we have been working on this project for more than three years",
    "en" -> "the weather today is quite pleasant with a light breeze from the north",
    "en" -> "he could not remember where he had left the keys to the old house",
    "en" -> "it was the best of times and it was the worst of times for everyone",
    "en" -> "the children were playing in the garden while their parents watched",
    "en" -> "this is the first time that we have seen such a beautiful sunset",
    "en" -> "they decided to walk along the beach before returning to the hotel",
    "en" -> "a good book and a warm cup of tea make the evening feel complete",
    "en" -> "the meeting will take place on thursday afternoon in the main hall",
    "fr" -> "le chat noir dort sur le canape pres de la fenetre du salon",
    "fr" -> "elle a dit que nous devrions attendre le train du matin a la gare",
    "fr" -> "il n'y a rien de plus important que la sante des gens du village",
    "fr" -> "nous travaillons sur ce projet depuis plus de trois ans maintenant",
    "fr" -> "le temps est tres agreable aujourd'hui avec une legere brise du nord",
    "fr" -> "il ne se souvenait plus ou il avait laisse les cles de la maison",
    "fr" -> "c'etait le meilleur des temps et c'etait le pire des temps pour tous",
    "fr" -> "les enfants jouaient dans le jardin pendant que leurs parents regardaient",
    "fr" -> "c'est la premiere fois que nous voyons un si beau coucher de soleil",
    "fr" -> "ils ont decide de marcher le long de la plage avant de rentrer",
    "fr" -> "un bon livre et une tasse de the chaud rendent la soiree parfaite",
    "fr" -> "la reunion aura lieu jeudi apres-midi dans la grande salle de la mairie",
    "de" -> "die katze schlaft auf dem sofa neben dem fenster im wohnzimmer",
    "de" -> "sie sagte dass wir besser auf den zug am morgen warten sollten",
    "de" -> "es gibt nichts wichtigeres als die gesundheit der menschen im dorf",
    "de" -> "wir arbeiten seit mehr als drei jahren an diesem grossen projekt",
    "de" -> "das wetter ist heute sehr angenehm mit einer leichten brise aus norden",
    "de" -> "er konnte sich nicht erinnern wo er die schlussel des hauses gelassen hatte",
    "de" -> "es war die beste zeit und es war die schlimmste zeit fur alle menschen",
    "de" -> "die kinder spielten im garten wahrend ihre eltern ihnen zuschauten",
    "de" -> "das ist das erste mal dass wir einen so schonen sonnenuntergang sehen",
    "de" -> "sie beschlossen am strand entlang zu gehen bevor sie ins hotel gingen",
    "de" -> "ein gutes buch und eine warme tasse tee machen den abend vollkommen",
    "de" -> "die besprechung findet am donnerstag nachmittag im grossen saal statt",
    "es" -> "el gato negro duerme en el sofa cerca de la ventana de la sala",
    "es" -> "ella dijo que deberiamos esperar el tren de la manana en la estacion",
    "es" -> "no hay nada mas importante que la salud de la gente del pueblo",
    "es" -> "hemos estado trabajando en este proyecto durante mas de tres anos",
    "es" -> "el tiempo hoy es muy agradable con una brisa ligera del norte",
    "es" -> "no podia recordar donde habia dejado las llaves de la casa vieja",
    "es" -> "era el mejor de los tiempos y era el peor de los tiempos para todos",
    "es" -> "los ninos jugaban en el jardin mientras sus padres los miraban",
    "es" -> "esta es la primera vez que vemos una puesta de sol tan hermosa",
    "es" -> "decidieron caminar por la playa antes de regresar al hotel viejo",
    "es" -> "un buen libro y una taza de te caliente hacen la noche perfecta",
    "es" -> "la reunion tendra lugar el jueves por la tarde en la sala principal")

  private[text] lazy val fixtureDocs = corpus.zipWithIndex
    .map { case ((lang, text), i) => (i.toLong, lang, text) }
    .toDF("doc_id", "lang", "text")

  test("p54: held-out accuracy >= 0.9 on genuinely multilingual text") {
    // 3-fold-ish split: every 4th doc held out (9 train / 3 test per lang)
    val train = fixtureDocs.filter($"doc_id" % 4 =!= 0)
    val test  = fixtureDocs.filter($"doc_id" % 4 === 0)
    val feat = LangClassifier.featureTable(fixtureDocs).persist()
    val fitted = LangClassifier.fitOvr(
      feat.join(train.select($"doc_id"), Seq("doc_id"), "left_semi"),
      train.select($"doc_id", $"lang"))
    val weights = fitted.flatMap { case (l, w, b) =>
      w.toSeq.zipWithIndex.map { case (v, i) => (l, i, v) } :+ ((l, -1, b))
    }.toDF("lang", "bucket", "w")
    val pred = LangClassifier.predict(
        LangClassifier.marginTable(feat, weights))
      .join(test, Seq("doc_id"))
    val n = pred.count().toDouble
    val correct = pred.filter($"lang_pred" === $"lang").count().toDouble
    feat.unpersist(false)
    assert(n === 12.0)
    assert(correct / n >= 0.9,
      s"held-out lang-id accuracy ${correct / n} < 0.9 — the learned model must beat the toy scorer")
  }

  test("p54: argmax tie-break is deterministic (margin desc, lang asc)") {
    val margins = Seq(
      (1L, "en", 500L), (1L, "fr", 500L), (1L, "de", 400L),
      (2L, "es", -10L), (2L, "de", -10L)).toDF("doc_id", "lang", "margin_micros")
    val out = LangClassifier.predict(margins).orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, "en", 500L), (2L, "de", -10L)))
  }

  test("p54: feature table is uniform-share-normalized and bucket-bounded") {
    val f = LangClassifier.featureTable(Seq((1L, "xx", "abcd")).toDF("doc_id", "lang", "text"))
      .collect().map(r => (r.getInt(1), r.getDouble(2)))
    // "abcd": 2-grams ab bc cd + d(partial), 3-grams abc bcd cd(partial) d? —
    // exact gram set aside, the invariants are what scoring relies on:
    assert(f.forall { case (b, _) => b >= 0 && b < LangClassifier.D })
    // cnt = D · share, so per-doc cnt sums to D (1.0 = uniform share —
    // unit-scale features keep the ridge priced for O(1) weights)
    assert(math.abs(f.map(_._2).sum - LangClassifier.D) < 1e-9,
      "per-doc cnt must sum to D")
  }

  test("p54: langized derivation splices the labeled language's function words, deterministically") {
    val in = Seq(
      (7L, "fr", "alpha beta gamma delta epsilon zeta eta theta iota"),
      (8L, "zz", "alpha beta gamma")).toDF("doc_id", "lang", "text")
    val out1 = LangClassifier.langized(in).orderBy($"doc_id")
      .select($"text").as[String].collect()
    val out2 = LangClassifier.langized(in).orderBy($"doc_id")
      .select($"text").as[String].collect()
    assert(out1.toSeq == out2.toSeq, "derivation must be deterministic")
    val frWords = LangClassifier.FuncWords("fr").toSet
    val spliced = out1(0).split(" ").filterNot(
      "alpha beta gamma delta epsilon zeta eta theta iota".split(" ").toSet)
    assert(spliced.nonEmpty && spliced.forall(frWords),
      s"spliced tokens ${spliced.toSeq} must be French function words")
    // original token order preserved
    assert(out1(0).split(" ").filterNot(frWords).toSeq ==
      "alpha beta gamma delta epsilon zeta eta theta iota".split(" ").toSeq)
    // unknown lang → text unchanged
    assert(out1(1) == "alpha beta gamma")
  }
}
