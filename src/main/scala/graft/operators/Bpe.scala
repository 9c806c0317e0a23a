package graft.operators

/** Byte-pair-encoding tokenizer training and inference — the learned
  * subword vocabulary a pretraining pipeline builds once per corpus and
  * applies to every document thereafter (Sennrich et al. 2016, the
  * standard algorithm; the reference engine has no tokenizer surface).
  *
  * Scale decomposition (the Ivf.train pattern): training never touches
  * the corpus row-by-row — it runs on the WORD-FREQUENCY TABLE, which
  * Spark builds distributed (one groupBy over the exploded tokens) and
  * which is vocabulary-sized, not corpus-sized; the iterative pair-merge
  * loop then runs on the driver over that bounded table, exactly how
  * production BPE trainers (SentencePiece, HF tokenizers) consume a
  * pre-counted word table. Inference is likewise factored so the
  * imperative kernel runs ONCE PER DISTINCT WORD (a bounded mapPartitions
  * over the word table, the documented imperative-seam shape), and
  * per-document tokenization is pure relational work — explode, join on
  * word, ordered re-assembly.
  *
  * Everything is deterministic: merge selection breaks frequency ties
  * lexicographically, the trainer's word-table cap is ordered
  * (count desc, word asc), and inference merges the lowest-rank pair
  * first — so tokenization is a pure function of (corpus, confs), which
  * is what lets the round-trip and repartition-invariance gates be exact.
  */
object Bpe {

  /** End-of-word sentinel (its own symbol, never merged into by chars —
    * fixture text is space-separated lowercase/digits, so the sentinel
    * cannot collide with a literal token). */
  val EndMark = "</w>"

  /** Learn up to `nMerges` merges from a (word, count) table. Each round
    * counts adjacent symbol pairs weighted by word frequency, merges the
    * most frequent pair everywhere (ties: lexicographically smallest
    * pair), and records it. Stops early when no pair repeats. */
  def train(words: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var vocab: Array[(Array[String], Long)] =
      words.map { case (w, c) => (symbols(w), c) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    while (rounds < nMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      val candidates = pairCounts.filter(_._2 > 1)
      if (candidates.isEmpty) rounds = nMerges
      else {
        val best = candidates.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, c) => (mergePair(syms, best), c) }
        rounds += 1
      }
    }
    merges.toSeq
  }

  /** Tokenize one word under a learned merge ranking: repeatedly merge
    * every occurrence of the LOWEST-RANK pair present until none applies
    * — the standard BPE inference order, a pure function of the word. */
  def encode(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = symbols(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) done = true
      else syms = mergePair(syms, best)
    }
    syms
  }

  /** Inverse of [[encode]]∘[[symbols]]: concatenating a word's tokens and
    * stripping the sentinel reproduces the word exactly — the round-trip
    * identity the gates hold. */
  def decode(tokens: Seq[String]): String =
    tokens.mkString("").stripSuffix(EndMark)

  private def symbols(word: String): Array[String] =
    (word.map(_.toString) :+ EndMark).toArray

  /** Merge every left-to-right non-overlapping occurrence of `pair`. */
  private def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }
}
