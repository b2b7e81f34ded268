package graft.core

/** Deterministic, dependency-free language identification heuristic.
  *
  * The reference uses fastText lid.176.ftz with a 0.6 probability floor
  * (`wordslab.nlptextdoc/NLPTextAnalyzer.cs:45-59,176-198`); that native
  * model is unavailable offline, so per SURVEY.md §7 the detector is
  * pluggable and this default is a stopword/character heuristic that is
  * stable across runs — parity tests pin this heuristic, they never depend
  * on fastText outputs. Returns an ISO-639-1 code or "?" when confidence is
  * low (the reference's "?" fallback).
  */
object LangId {

  private val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "for",
      "was", "with", "are", "this", "have", "from", "not", "they", "his",
      "her", "you", "all", "were", "when", "there", "can", "been", "has",
      "more", "who", "will", "about", "which"),
    "fr" -> Set("le", "la", "les", "de", "des", "du", "et", "est", "en",
      "un", "une", "dans", "que", "qui", "pour", "sur", "avec", "pas",
      "par", "plus", "mais", "comme", "sont", "nous", "vous", "leur",
      "cette", "ces", "aux", "être", "fait", "était"),
    "de" -> Set("der", "die", "das", "und", "ist", "von", "den", "mit",
      "auf", "für", "nicht", "ein", "eine", "als", "auch", "aus", "bei",
      "nach", "wie", "wird", "sind", "oder", "zum", "zur", "über", "wenn",
      "aber", "noch", "werden", "einer"),
    "es" -> Set("el", "la", "los", "las", "de", "que", "en", "un", "una",
      "por", "con", "para", "del", "se", "su", "al", "es", "como", "más",
      "pero", "sus", "fue", "ser", "son", "entre", "está", "cuando",
      "hay", "este", "esta"))

  private val langsOrdered = Vector("en", "fr", "de", "es")

  /** Classify one text. "?" when fewer than 2 words or no language reaches
    * a 0.18 stopword-hit ratio (the deterministic analog of the reference's
    * probability floor).
    */
  def detect(text: String): String = {
    val words = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (words.length < 2) return "?"
    var bestLang = "?"
    var bestHits = 0
    langsOrdered.foreach { lang =>
      val sw = stopwords(lang)
      var hits = 0
      words.foreach(w => if (sw.contains(w)) hits += 1)
      if (hits > bestHits) { bestHits = hits; bestLang = lang }
    }
    if (bestHits.toDouble / words.length >= 0.18) bestLang else "?"
  }
}
