package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Column-level text-pipeline kernels shared between the Scala query
  * surface (`queries/TextQueries.scala`) and the BQL scalar verbs
  * (`bql/Compiler.scala`) — one definition, so the BQL twin and its
  * oracle cannot drift from the Scala twin. All builders are null-safe
  * (`coalesce(text, '')`): a null document must score like an empty
  * one on BOTH engines, not poison `size(split(null)) = null` rows.
  */
object TextFns {

  /** The langid lexicon: deterministic hit-count scoring over fixed
    * keyword sets (the n-gram-free heuristic the fixture's vocabulary
    * supports; a real corpus swaps richer lexicons in). */
  val lex: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("data", "value", "row"),
    "de" -> Seq("merge", "join", "group"),
    "fr" -> Seq("table", "column", "line"),
    "zh" -> Seq("spark", "query", "stream"))

  private def safe(text: Column): Column = coalesce(text, lit(""))

  def toks(text: Column): Column = split(safe(text), " ")

  def hitCount(text: Column, lexicon: Seq[String]): Column =
    size(filter(toks(text), t => t.isInCollection(lexicon)))

  /** Whitespace token count — the TOKENS(text) verb. */
  def tokenCount(text: Column): Column =
    size(toks(text)).cast(LongType)

  /** Language-ID argmax: lexicon hit counts with a deterministic
    * first-wins tie rule in `lex` order — the LANGID(text) verb. */
  def langId(text: Column): Column = {
    val scores = lex.map { case (l, ws) => l -> hitCount(text, ws) }
    val top = greatest(scores.map(_._2): _*)
    scores.tail.foldLeft(when(scores.head._2 === top, scores.head._1)) {
      case (w, (l, s)) => w.when(s === top, l)
    }
  }

  /** Composite quality score 0..3 (length band + uniqueness + stopword
    * presence — the standard pre-training corpus filter trio), computed
    * from the text expression alone so it composes inside WHERE. */
  def quality(text: Column): Column = {
    val t = toks(text)
    val stops = size(filter(t, x => x.isInCollection(Seq("the", "a"))))
    // stays IntegerType: the DuckDB oracle's CASE sum is INTEGER, and
    // schema compare is part of the correctness gate
    when(length(safe(text)).between(100, 5000), 1).otherwise(0)
      .+(when(size(array_distinct(t)) * 2 >= size(t), 1).otherwise(0))
      .+(when(stops > 0, 1).otherwise(0))
  }

  /** DuckDB spellings of the same kernels — the oracle side of the BQL
    * verbs, generated from the SAME `lex`/formulas (shared vals). */
  def sqlHitCount(lexicon: Seq[String]): String =
    s"len(list_filter(string_split(coalesce(text,''),' '), " +
      s"t -> list_contains([${lexicon.map("'" + _ + "'").mkString(",")}], t)))"

  def sqlLangId: String = {
    val scores = lex.map { case (l, ws) => s"${sqlHitCount(ws)} AS s_$l" }
      .mkString(", ")
    val top = s"greatest(${lex.map(l => s"s_${l._1}").mkString(",")})"
    val cases = lex.map(l => s"WHEN s_${l._1} = $top THEN '${l._1}'").mkString(" ")
    s"SELECT doc_id, CASE $cases END AS lang_pred FROM " +
      s"(SELECT doc_id, text, $scores FROM documents)"
  }

  def sqlTokenCount: String = "len(string_split(coalesce(text,''),' '))"

  def sqlQuality: String =
    "(CASE WHEN length(coalesce(text,'')) BETWEEN 100 AND 5000 THEN 1 ELSE 0 END" +
      " + CASE WHEN len(list_distinct(string_split(coalesce(text,''),' '))) * 2" +
      " >= len(string_split(coalesce(text,''),' ')) THEN 1 ELSE 0 END" +
      s" + CASE WHEN ${sqlHitCount(Seq("the", "a"))} > 0 THEN 1 ELSE 0 END)"
}
