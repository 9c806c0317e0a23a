package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Text analysis over the `documents` table — the training-data-pipeline
  * surface (language-ID, quality scoring, token counting, fingerprinting).
  *
  * The reference has no text operators (its expression set tops out at
  * TRIM/LOWER/UPPER/RLIKE, SURVEY.md §2.B B3); these extend the engine the
  * way a 100 TB corpus pipeline needs. Everything here is per-row Catalyst
  * expression work (codegen'd, no shuffle except the final ORDER BY, which
  * exists only for oracle determinism) — the shape that scales linearly.
  *
  * Oracle parity notes: token separator in the fixtures is a single space,
  * so `split(text, ' ')` (Spark) == `string_split(text, ' ')` (DuckDB);
  * ratios are computed as BIGINT-ratio double divisions (deterministic IEEE
  * ops, no order-dependent float summation).
  */
object TextQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "documents")

  private val toks: Column = split(col("text"), " ")

  /** Tiny per-language lexicons over the fixture vocabulary; scoring =
    * lexicon-hit count, argmax with fixed tie order (en,es,de,fr,zh). */
  // the lexicon is SHARED with the BQL LANGID verb (graft.functions
  // .TextFns) — one val, so the verb and this query cannot drift
  private val lex = graft.functions.TextFns.lex

  private def hitCount(lexicon: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(lexicon)))

  /** Numeric value 0..15 of a single hex-digit column (Spark `conv`;
    * the DuckDB oracle spells the same thing `strpos(hexAlphabet, c) - 1`). */
  private def nibbleValue(c: Column): Column =
    conv(c, 16, 10).cast(LongType)

  private def sqlHitCount(lexicon: Seq[String]): String =
    s"len(list_filter(string_split(text,' '), t -> list_contains([${lexicon.map("'" + _ + "'").mkString(",")}], t)))"

  val defs: Seq[QueryDef] = Seq(

    // Token counting: whitespace tokens, distinct tokens, BPE-ish regex
    // token count, mean token length (exact integer formula: single-space
    // separators make len(text) = sum(len(tok)) + n - 1).
    QueryDef("tx_tokens", Some(
      """SELECT doc_id,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(list_distinct(string_split(text,' '))) AS n_uniq,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS n_bpe,
        |  CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE)
        |    / len(string_split(text,' ')) AS mean_tok_len
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, d) =>
      docs(s, d).select(
        col("doc_id"),
        size(toks).cast(LongType).as("n_tokens"),
        size(array_distinct(toks)).cast(LongType).as("n_uniq"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).cast(LongType).as("n_bpe"),
        ((length(col("text")) - size(toks) + 1).cast(DoubleType) / size(toks))
          .as("mean_tok_len"))
        .orderBy(col("doc_id"))
    },

    // Quality scoring: length/stopword/uniqueness ratios + a composite
    // score — the standard pre-training corpus filters.
    QueryDef("tx_quality", Some(
      """SELECT doc_id, n_chars,
        |  len(string_split(text,' ')) AS n_tokens,
        |  CAST(len(list_filter(string_split(text,' '), t -> list_contains(['the','a'], t))) AS DOUBLE)
        |    / len(string_split(text,' ')) AS stop_ratio,
        |  CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
        |    / len(string_split(text,' ')) AS uniq_ratio,
        |  (CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 1 ELSE 0 END
        |   + CASE WHEN len(list_distinct(string_split(text,' '))) * 2 >= len(string_split(text,' ')) THEN 1 ELSE 0 END
        |   + CASE WHEN len(list_filter(string_split(text,' '), t -> list_contains(['the','a'], t))) > 0 THEN 1 ELSE 0 END) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val stops = size(filter(toks, t => t.isInCollection(Seq("the", "a"))))
      docs(s, d).select(
        col("doc_id"), col("n_chars"),
        size(toks).cast(LongType).as("n_tokens"),
        (stops.cast(DoubleType) / size(toks)).as("stop_ratio"),
        (size(array_distinct(toks)).cast(DoubleType) / size(toks)).as("uniq_ratio"),
        (when(col("n_chars").between(100, 5000), 1).otherwise(0)
          + when(size(array_distinct(toks)) * 2 >= size(toks), 1).otherwise(0)
          + when(stops > 0, 1).otherwise(0)).as("quality"))
        .orderBy(col("doc_id"))
    },

    // Language-ID: lexicon-hit scoring with deterministic argmax.
    QueryDef("tx_langid", Some({
      val scores = lex.map { case (l, ws) => s"${sqlHitCount(ws)} AS s_$l" }.mkString(",\n  ")
      val gt = s"greatest(${lex.map(l => s"s_${l._1}").mkString(",")})"
      val pred = lex.map(l => s"WHEN s_${l._1} = $gt THEN '${l._1}'").mkString(" ")
      s"""SELECT doc_id, s_en, s_es, s_de, s_fr, s_zh,
         |  CASE $pred END AS pred_lang
         |FROM (SELECT doc_id, $scores FROM documents)
         |ORDER BY doc_id""".stripMargin
    })) { (s, d) =>
      val scored = docs(s, d).select(
        col("doc_id") +: lex.map { case (l, ws) => hitCount(ws).cast(LongType).as(s"s_$l") }: _*)
      val gt = greatest(lex.map(l => col(s"s_${l._1}")): _*)
      val pred = lex.tail.foldLeft(when(col("s_en") === gt, "en")) { case (w, (l, _)) =>
        w.when(col(s"s_$l") === gt, l)
      }
      scored.withColumn("pred_lang", pred).orderBy(col("doc_id"))
    },

    // Corpus n-gram statistics: top bigrams by document frequency — the
    // vocabulary/contamination scan a corpus pipeline runs; counts are
    // per-document-distinct so hot documents cannot dominate.
    QueryDef("tx_ngram_freq", Some(
      """WITH bg AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([array_to_string(t[i:i+1],' ')
        |      FOR i IN range(1, len(t))])) AS bigram
        |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents))
        |SELECT bigram, count(*) AS df FROM bg
        |GROUP BY bigram ORDER BY df DESC, bigram LIMIT 20""".stripMargin)) { (s, d) =>
      // bigrams via TWO bulk slices + elementwise concat — not one
      // 2-element slice allocation per position, which is what a
      // transform(sequence(...), i -> slice(t, i, 2)) costs
      val t = toks
      val n = greatest(size(t) - 1, lit(0))
      val bigrams = array_distinct(zip_with(
        slice(t, lit(1), n), slice(t, lit(2), n),
        (a, b) => concat_ws(" ", a, b)))
      docs(s, d)
        .select(col("doc_id"), explode(bigrams).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("bigram"))
        .limit(20)
    },

    // Text normalization: the standard pre-tokenization cleanup pass —
    // lowercase, strip punctuation to spaces, collapse whitespace, trim.
    // Pure per-row codegen'd string ops; linear, no shuffle.
    QueryDef("tx_normalize", Some(
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm,
        |  length(text) - length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS removed
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
      docs(s, d).select(
        col("doc_id"), norm.as("norm"),
        (length(col("text")) - length(norm)).as("removed"))
        .orderBy(col("doc_id"))
    },

    // PII-style redaction: regex rewrite of email-shaped tokens — the
    // scrub pass a training corpus runs before anything else sees the
    // text. Patterns kept to the RE2 ∩ java.util.regex dialect so the
    // DuckDB oracle is exact.
    QueryDef("tx_redact", Some(
      """SELECT doc_id,
        |  regexp_replace(text, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g') AS redacted,
        |  len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+')) AS n_hits
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, d) =>
      docs(s, d).select(
        col("doc_id"),
        regexp_replace(col("text"), "[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>").as("redacted"),
        size(expr("regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+', 0)"))
          .cast(LongType).as("n_hits"))
        .orderBy(col("doc_id"))
    },

    // Within-document repetition — the Gopher-style quality signals that
    // catch boilerplate and generation loops: duplicate bigram/trigram
    // fractions plus the character share of the single most frequent
    // bigram. Entirely per-row codegen: distinct n-gram counts come from
    // ngram_hashes (no string arrays), the argmax from top_ngram (the
    // relational shape — explode → count → per-doc rank-1 → join back —
    // shuffles the corpus twice; this never shuffles at all, the final
    // ORDER BY being oracle determinism only).
    // Compressibility quality filter — the Gopher/FineWeb-style signal
    // tx_repetition's n-gram ratios cannot see: ACTUAL Lempel-Ziv
    // redundancy via per-doc deflate length (java.util.zip, level 6,
    // raw stream). Emits deflate(text) and deflate(text||text): the
    // doubled-text length certifies the compressor exploits cross-copy
    // redundancy (deflate2 < 2·deflate), which is exactly the property
    // the "too-compressible → boilerplate" filter relies on. No SQL
    // oracle (DuckDB has no deflate) → GateCheck rows: bounds,
    // doubling-redundancy, determinism across re-runs. Scale shape:
    // per-partition map with a REUSED Deflater, no shuffle, one pass.
    QueryDef("tx_compress_ratio", None) { (s, d) =>
      val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("n_chars", LongType),
        StructField("deflate_len", LongType), StructField("deflate2_len", LongType))))
      docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
        val defl = new java.util.zip.Deflater(6, true)
        val buf = new Array[Byte](1 << 16)
        def dlen(str: String): Long = {
          defl.reset()
          defl.setInput(str.getBytes("UTF-8"))
          defl.finish()
          var total = 0L
          while (!defl.finished()) total += defl.deflate(buf)
          total
        }
        rows.map { r =>
          val id = r.getLong(0)
          val text = if (r.isNullAt(1)) "" else r.getString(1)
          org.apache.spark.sql.Row(
            id, text.length.toLong, dlen(text), dlen(text + text))
        }
      }(enc).orderBy(col("doc_id"))
    },

    QueryDef("tx_repetition", Some(
      """WITH g AS (
        |  SELECT doc_id, length(text) AS text_len,
        |    [array_to_string(t[i:i+1],' ') FOR i IN range(1, len(t))] AS bgs,
        |    [array_to_string(t[i:i+2],' ') FOR i IN range(1, len(t)-1)] AS tgs
        |  FROM (SELECT doc_id, text, string_split(text,' ') AS t FROM documents)),
        |per AS (
        |  SELECT doc_id, text_len, bgs,
        |    1.0 - CAST(len(list_distinct(bgs)) AS DOUBLE) / len(bgs) AS dup_bigram_frac,
        |    CASE WHEN len(tgs) = 0 THEN 0.0
        |      ELSE 1.0 - CAST(len(list_distinct(tgs)) AS DOUBLE) / len(tgs) END AS dup_trigram_frac
        |  FROM g),
        |top AS (
        |  SELECT doc_id, b AS top_bigram, count(*) AS c
        |  FROM (SELECT doc_id, unnest(bgs) AS b FROM g)
        |  GROUP BY doc_id, b
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, b) = 1)
        |SELECT per.doc_id, dup_bigram_frac, dup_trigram_frac, top_bigram,
        |  CAST(c * length(top_bigram) AS DOUBLE) / text_len AS top_bigram_char_frac
        |FROM per JOIN top ON per.doc_id = top.doc_id
        |ORDER BY per.doc_id""".stripMargin)) { (s, d) =>
      import graft.functions.{ngram_hashes, top_ngram}
      val t = toks
      val nBigrams = size(t) - 1 // docs below 2 tokens filter out on tp null
      val nTrigrams = greatest(size(t) - 2, lit(0))
      docs(s, d).select(
        col("doc_id"), length(col("text")).as("text_len"),
        (lit(1.0) - size(ngram_hashes(t, 2)).cast(DoubleType) / nBigrams)
          .as("dup_bigram_frac"),
        when(nTrigrams === 0, 0.0)
          .otherwise(lit(1.0) - size(ngram_hashes(t, 3)).cast(DoubleType) / nTrigrams)
          .as("dup_trigram_frac"),
        top_ngram(t, 2).as("tp"))
        .filter(col("tp").isNotNull)
        .select(col("doc_id"), col("dup_bigram_frac"), col("dup_trigram_frac"),
          col("tp.ngram").as("top_bigram"),
          ((col("tp.cnt") * length(col("tp.ngram"))).cast(DoubleType) / col("text_len"))
            .as("top_bigram_char_frac"))
        .orderBy(col("doc_id"))
    },

    // Benchmark decontamination: for every training doc, how many
    // distinct 5-token shingles it shares with the eval corpus (stand-in:
    // source 'src0') — the overlap scan a pipeline runs before training
    // so eval answers don't leak into the corpus. Scale shape: the eval
    // side is a benchmark (tiny next to a 100 TB corpus), so its distinct
    // shingle hashes BROADCAST; the corpus side explodes to (doc_id,
    // Contamination REPORT, eval-side — the view tx_decontaminate's
    // train-side fractions can't give the benchmark owner: for each EVAL
    // document, how many training docs share at least one 5-shingle with
    // it and how many shared-shingle pairings exist in total. This is
    // the per-item audit that decides whether a leaked benchmark item is
    // one stray quote or wholesale duplication. Scale shape: both sides
    // explode to (id, 8-byte shingle hash), equi-join on the hash (the
    // only corpus-scale exchange carries longs), then two
    // map-side-combining aggregates — pair grain first, eval grain
    // second. Hash identity stands in for shingle identity; the oracle
    // groups by the shingle STRING, so a collision would surface as a
    // mismatch. All-integer output.
    QueryDef("tx_contamination_report", Some(
      """WITH g AS (
        |  SELECT doc_id, source,
        |    list_distinct([array_to_string(t[i:i+4],' ') FOR i IN range(1, len(t)-3)]) AS shs
        |  FROM (SELECT doc_id, source, string_split(text,' ') AS t FROM documents)),
        |ev AS (SELECT doc_id AS eval_id, unnest(shs) AS sh FROM g WHERE source = 'src0'),
        |tr AS (SELECT doc_id AS train_id, unnest(shs) AS sh FROM g WHERE source <> 'src0'),
        |p AS (SELECT eval_id, train_id, count(*) AS n_sh
        |      FROM ev JOIN tr USING (sh) GROUP BY eval_id, train_id),
        |a AS (SELECT eval_id, count(*) AS n_docs, CAST(sum(n_sh) AS BIGINT) AS n_pairs
        |      FROM p GROUP BY eval_id)
        |SELECT g.doc_id AS eval_id,
        |  coalesce(a.n_docs, 0) AS n_leaky_train_docs,
        |  coalesce(a.n_pairs, 0) AS n_shared_shingles
        |FROM g LEFT JOIN a ON g.doc_id = a.eval_id
        |WHERE g.source = 'src0' ORDER BY eval_id""".stripMargin)) { (s, d) =>
      val evalSource = s.conf.get("spark.graft.decontaminate.evalSource", "src0")
      val base = docs(s, d).select(col("doc_id"), col("source"),
        graft.functions.ngram_hashes(toks, 5).as("hs"))
      val ev = base.filter(col("source") === evalSource)
        .select(col("doc_id").as("eval_id"), explode(col("hs")).as("h"))
      val tr = base.filter(col("source") =!= evalSource)
        .select(col("doc_id").as("train_id"), explode(col("hs")).as("h"))
      val pairs = ev.join(tr, Seq("h"))
        .groupBy(col("eval_id"), col("train_id"))
        .agg(count(lit(1)).as("n_sh"))
      val agg = pairs.groupBy(col("eval_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_sh")).as("n_pairs"))
      base.filter(col("source") === evalSource)
        .select(col("doc_id").as("eval_id"))
        .join(agg, Seq("eval_id"), "left")
        .select(col("eval_id"),
          coalesce(col("n_docs"), lit(0L)).as("n_leaky_train_docs"),
          coalesce(col("n_pairs"), lit(0L)).as("n_shared_shingles"))
        .orderBy(col("eval_id"))
    },

    // hash), survives the broadcast inner join only on contaminated
    // shingles, and aggregates per doc — one doc_id-keyed shuffle of the
    // (rare) hits, never of the corpus shingles.
    QueryDef("tx_decontaminate", Some(
      """WITH g AS (
        |  SELECT doc_id, source,
        |    list_distinct([array_to_string(t[i:i+4],' ') FOR i IN range(1, len(t)-3)]) AS shs
        |  FROM (SELECT doc_id, source, string_split(text,' ') AS t FROM documents)),
        |ev AS (SELECT DISTINCT unnest(shs) AS s FROM g WHERE source = 'src0'),
        |tr AS (SELECT doc_id, len(shs) AS n_shingles, shs FROM g WHERE source <> 'src0'),
        |hits AS (
        |  SELECT doc_id, count(*) AS n_hits
        |  FROM (SELECT doc_id, unnest(shs) AS s FROM tr) x JOIN ev USING (s)
        |  GROUP BY doc_id)
        |SELECT tr.doc_id, coalesce(n_hits, 0) AS n_hits, n_shingles,
        |  CASE WHEN n_shingles = 0 THEN 0.0
        |    ELSE CAST(coalesce(n_hits, 0) AS DOUBLE) / n_shingles END AS contam_frac
        |FROM tr LEFT JOIN hits ON tr.doc_id = hits.doc_id
        |ORDER BY tr.doc_id""".stripMargin)) { (s, d) =>
      // deploy knob; the static oracle SQL pins the fixture's default
      val evalSource = s.conf.get("spark.graft.decontaminate.evalSource", "src0")
      val base = docs(s, d).select(col("doc_id"), col("source"),
        graft.functions.ngram_hashes(toks, 5).as("hs"))
      val ev = base.filter(col("source") === evalSource)
        .select(explode(col("hs")).as("h")).distinct()
      val tr = base.filter(col("source") =!= evalSource)
      val hits = tr.select(col("doc_id"), explode(col("hs")).as("h"))
        .join(broadcast(ev), Seq("h"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      tr.select(col("doc_id"), size(col("hs")).cast(LongType).as("n_shingles"))
        .join(hits, Seq("doc_id"), "left")
        .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
        .select(col("doc_id"), col("n_hits"), col("n_shingles"),
          when(col("n_shingles") === 0, 0.0)
            .otherwise(col("n_hits").cast(DoubleType) / col("n_shingles"))
            .as("contam_frac"))
        .orderBy(col("doc_id"))
    },

    // Token-rarity scoring against corpus statistics — the frequency-based
    // stand-in for LM-perplexity filtering: hapax and rare-token counts
    // per doc flag garbled or out-of-domain text. Two-pass corpus shape:
    // pass 1 builds the vocabulary (token-hash keyed count — 8-byte keys,
    // the map-side-combined aggregation every word-count is), pass 2
    // shuffle-joins each token instance to its corpus count (no broadcast
    // assumption: a 100 TB vocabulary's long tail doesn't fit anywhere)
    // and folds per doc. All-integer output — float-free, hash-stable.
    QueryDef("tx_rarity", Some(
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
        |v AS (SELECT t, count(*) AS c FROM tok GROUP BY t)
        |SELECT doc_id, count(*) AS n_tokens,
        |  count(*) FILTER (WHERE c = 1) AS n_hapax,
        |  count(*) FILTER (WHERE c <= 8) AS n_rare
        |FROM tok JOIN v USING (t)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val tok = docs(s, d)
        .select(col("doc_id"), explode(toks).as("t"))
        .select(col("doc_id"), xxhash64(col("t")).as("h"))
      val vocab = tok.groupBy(col("h")).agg(count(lit(1)).as("c"))
      tok.join(vocab, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          count(when(col("c") === 1, 1)).as("n_hapax"),
          count(when(col("c") <= 8, 1)).as("n_rare"))
        .orderBy(col("doc_id"))
    },

    // Bigram-level rarity — the sequence-aware sibling of tx_rarity and
    // the closest integer-exact proxy for bigram-LM perplexity filtering:
    // a doc whose adjacent-token pairs are mostly corpus-unique is
    // incoherent (shuffled/garbled text keeps plausible unigrams but
    // destroys bigrams). Per doc: bigram count, corpus-hapax bigrams, and
    // total corpus mass of its bigrams (all BIGINT — no log, no float
    // summation; downstream forms mass/n as the score). Same two-pass
    // corpus shape as tx_rarity: vocabulary over 8-byte bigram hashes,
    // then one shuffle join back (no broadcast assumption — a 100 TB
    // bigram vocabulary is itself corpus-sized). Bigrams come from a
    // zip_with of the token array against its own tail (codegen'd; the
    // trailing (last, null) pair concats to null and is filtered), so
    // bigram strings exist only inside the row before hashing.
    QueryDef("tx_bigram_rarity", Some(
      """WITH g AS (SELECT doc_id, [array_to_string(t[i:i+1],' ') FOR i IN range(1, len(t))] AS bgs
        |           FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents)),
        |tok AS (SELECT doc_id, unnest(bgs) AS b FROM g),
        |v AS (SELECT b, count(*) AS c FROM tok GROUP BY b)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  count(*) FILTER (WHERE c = 1) AS n_hapax_bigrams,
        |  CAST(sum(c) AS BIGINT) AS bigram_mass
        |FROM tok JOIN v USING (b)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val t = toks
      val bigrams = filter(
        zip_with(t, slice(t, lit(2), size(t)), (a, b) => concat(a, lit(" "), b)),
        x => x.isNotNull)
      val bg = docs(s, d)
        .select(col("doc_id"), explode(bigrams).as("b"))
        .select(col("doc_id"), xxhash64(col("b")).as("h"))
      val vocab = bg.groupBy(col("h")).agg(count(lit(1)).as("c"))
      bg.join(vocab, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          count(when(col("c") === 1, 1)).as("n_hapax_bigrams"),
          sum(col("c")).as("bigram_mass"))
        .orderBy(col("doc_id"))
    },

    // Bigram-LM surprisal — the actual conditional-probability LM score
    // behind CCNet/RefinedWeb perplexity filtering, made hash-exact: each
    // bigram's add-one-smoothed probability p = (c(w1 w2)+1)/(c(w1)+V) is
    // quantized in LOG2 via exact integer bit-lengths —
    // bits = len(bin(c(w1)+V)) − len(bin(c(w1 w2)+1)) — so the per-doc
    // score is a SUM OF INTEGERS (order-free, no cross-engine libm log
    // ulps), and perplexity ≈ 2^(bits/n). tx_bigram_rarity gives raw
    // corpus mass; this is the sequence-model-normalized quantity — a doc
    // of plausible-but-never-adjacent tokens scores high here and
    // ordinary there. Scale shape: the two model tables (unigram + bigram
    // counts on 8-byte hashes) are map-side-combined aggregations, then
    // TWO shuffle joins back (neither vocabulary broadcasts — a 100 TB
    // corpus's bigram table is itself corpus-sized); the 1-row V frame
    // rides in broadcast. milli_bits_per_bigram is exact integer
    // division — the resolution a filter thresholds on.
    QueryDef("tx_lm_surprisal", Some(lmSurprisalSql)) { (s, d) =>
      val bg = lmBigramPairs(docs(s, d), spread = true)
      val uni = docs(s, d).select(explode(toks).as("t"))
        .select(xxhash64(col("t")).as("hw"))
        .groupBy(col("hw")).agg(count(lit(1)).as("cu"))
      val bi = bg.groupBy(col("hb")).agg(count(lit(1)).as("cb"))
      lmScore(bg, uni, bi)
    },

    // DSIR-style importance scoring: rank general-corpus docs by how
    // target-domain-like they are (here target = source 'src0', the
    // in-domain seed set), via unigram corpus statistics — the
    // importance-resampling selection step of a pretraining pipeline.
    // Per doc: total target-model mass and corpus-model mass of its
    // tokens (integer count sums — float-free, hash-stable) plus the
    // number of target-leaning tokens, decided by the exact integer
    // cross-multiplication c_t·N_corpus > c_a·N_target (no division, no
    // log — downstream can form the ratio; the oracle-checked engine
    // output stays bit-exact). Plan shape mirrors tx_rarity: two
    // vocabulary aggregations on 8-byte token hashes, then one shuffle
    // join per model (target vocab is NOT broadcast — it is corpus-sized
    // at 100 TB); the 1-row totals frame rides in as a broadcast cross
    // join, never a driver-side constant bake.
    QueryDef("tx_importance", Some(
      """WITH tok AS (SELECT doc_id, source, unnest(string_split(text,' ')) AS t FROM documents),
        |ct AS (SELECT t, count(*) AS c_t FROM tok WHERE source = 'src0' GROUP BY t),
        |ca AS (SELECT t, count(*) AS c_a FROM tok GROUP BY t),
        |tot AS (SELECT (SELECT CAST(sum(c_t) AS BIGINT) FROM ct) AS n_t,
        |               (SELECT CAST(sum(c_a) AS BIGINT) FROM ca) AS n_a)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(coalesce(c_t, 0)) AS BIGINT) AS tgt_mass,
        |  CAST(sum(c_a) AS BIGINT) AS corp_mass,
        |  count(*) FILTER (WHERE coalesce(c_t, 0) * n_a > c_a * n_t) AS n_target_leaning
        |FROM tok JOIN ca USING (t) LEFT JOIN ct USING (t) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val tok = docs(s, d)
        .select(col("doc_id"), col("source"), explode(toks).as("t"))
        .select(col("doc_id"), col("source"), xxhash64(col("t")).as("h"))
      val ct = tok.filter(col("source") === "src0")
        .groupBy(col("h")).agg(count(lit(1)).as("c_t"))
      val ca = tok.groupBy(col("h")).agg(count(lit(1)).as("c_a"))
      val tot = ca.agg(sum(col("c_a")).as("n_a"))
        .crossJoin(ct.agg(sum(col("c_t")).as("n_t")))
      tok.join(ca, Seq("h"))
        .join(ct, Seq("h"), "left")
        .withColumn("c_t", coalesce(col("c_t"), lit(0L)))
        .crossJoin(broadcast(tot))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("c_t")).as("tgt_mass"),
          sum(col("c_a")).as("corp_mass"),
          count(when(col("c_t") * col("n_a") > col("c_a") * col("n_t"), 1))
            .as("n_target_leaning"))
        .orderBy(col("doc_id"))
    },

    // Context-window chunking: split each document into overlapping
    // token windows (32-token chunks, 8-token overlap → stride 24) — how
    // a pipeline materializes model-ready sequences from variable-length
    // docs. Pure per-row explode of computed offsets (sequence + slice,
    // all codegen'd); output rows ≈ tokens/stride, no shuffle except the
    // oracle ORDER BY.
    QueryDef("tx_chunk", Some(
      """WITH g AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |c AS (
        |  SELECT doc_id, t,
        |    unnest(range(0, CAST((len(t) - 1) // 24 AS BIGINT) + 1)) AS ci
        |  FROM g)
        |SELECT doc_id, ci,
        |  len(t[ci*24 + 1 : ci*24 + 32]) AS chunk_tokens,
        |  array_to_string(t[ci*24 + 1 : ci*24 + 32], ' ') AS chunk
        |FROM c ORDER BY doc_id, ci""".stripMargin)) { (s, d) =>
      val t = toks
      val stride = 24
      val width = 32
      // Column./ is double division — floor() makes the integer div explicit
      val nChunks = floor((size(t) - 1) / stride).cast(LongType) + 1
      docs(s, d)
        .select(col("doc_id"), t.as("t"),
          explode(sequence(lit(0L), nChunks - 1)).as("ci"))
        .select(col("doc_id"), col("ci"),
          size(slice(col("t"), (col("ci") * stride + 1).cast("int"), lit(width)))
            .cast(LongType).as("chunk_tokens"),
          concat_ws(" ", slice(col("t"), (col("ci") * stride + 1).cast("int"), lit(width)))
            .as("chunk"))
        .orderBy(col("doc_id"), col("ci"))
    },

    // Hashed-feature linear classifier scoring — the "apply the trained
    // quality/safety filter to the whole corpus" pass. The model is a
    // weight vector over hashed token features (the fasttext-style shape);
    // per doc the score is Σ w[h(token)] and the keep decision is a
    // threshold. Weights here are a 16-bucket stand-in bound to the md5
    // first nibble so the DuckDB oracle is bit-exact and integer-only; a
    // real deployment swaps in its trained vector (broadcast, or baked
    // into the expression like this) without changing the plan: one
    // linear codegen'd pass, no explode, no shuffle (ORDER BY is oracle
    // determinism only).
    QueryDef("tx_classify", Some(
      """SELECT doc_id, len(string_split(text,' ')) AS n_tokens,
        |  CAST(list_sum(list_transform(string_split(text,' '),
        |    x -> strpos('0123456789abcdef', substr(md5(x),1,1)) - 9)) AS BIGINT) AS score,
        |  CASE WHEN list_sum(list_transform(string_split(text,' '),
        |    x -> strpos('0123456789abcdef', substr(md5(x),1,1)) - 9)) >= 0
        |    THEN 1 ELSE 0 END AS keep
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, d) =>
      // w(token) = md5 first-nibble value − 8 (∈ [−8, 7]); fold with
      // aggregate() so no per-token rows ever exist. The fold is computed
      // in its OWN projection and `keep` derived from the score column —
      // putting the same expression in both output columns would run the
      // md5-per-token fold twice per row (Spark's subexpression
      // elimination skips lambda-bearing higher-order functions, and
      // CollapseProject leaves a non-cheap producer referenced twice in
      // its own projection).
      val score = aggregate(
        transform(toks, x => nibbleValue(substring(md5(x), 1, 1)) - 8),
        lit(0L), (acc, x) => acc + x)
      docs(s, d).select(
        col("doc_id"),
        size(toks).cast(LongType).as("n_tokens"),
        score.as("score"))
        .withColumn("keep", when(col("score") >= 0, 1).otherwise(0))
        .orderBy(col("doc_id"))
    },

    // Per-source corpus reporting: the snapshot table a pipeline publishes
    // per ingest source — doc/token volumes, language spread, and discrete
    // length percentiles. percentile_disc picks an actual element
    // (smallest value with cumulative distribution ≥ p, identical
    // semantics in Spark and DuckDB — verified ceil(p·n) on both), so the
    // output is integer-exact, no interpolated floats. One partial+final
    // hash aggregate keyed by the ~20 sources; the percentile columns are
    // the only per-group sort and they sort (source, n_chars) pairs, not
    // documents.
    QueryDef("tx_corpus_stats", Some(
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text,' '))) AS BIGINT) AS total_tokens,
        |  count(DISTINCT lang) AS n_langs,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p50_chars,
        |  CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p95_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)) { (s, d) =>
      docs(s, d)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(toks)).as("total_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)")
            .cast(LongType).as("p50_chars"),
          expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars)")
            .cast(LongType).as("p95_chars"))
        .orderBy(col("source"))
    },

    // Document fingerprinting: md5 over the sorted distinct token set —
    // an order-insensitive content fingerprint (catches shuffled
    // near-duplicates that byte-hashing misses).
    QueryDef("tx_fingerprint", Some(
      s"""SELECT doc_id,
        |  ${Fingerprints.sql} AS fp,
        |  md5(text) AS exact_fp
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, d) =>
      docs(s, d).select(
        col("doc_id"),
        Fingerprints.tokenSetFp(toks).as("fp"),
        md5(col("text")).as("exact_fp"))
        .orderBy(col("doc_id"))
    },

    // Vocabulary coverage / OOV rate — the tokenizer-fit check run before
    // training: build the vocabulary from the train split (sources with
    // numeric suffix < 15, min corpus frequency 100), then measure each
    // eval-split document's out-of-vocabulary token mass. High OOV flags
    // domain drift or tokenizer mismatch. Scale shape mirrors tx_rarity:
    // the vocabulary is corpus-derived so it is NOT broadcast — tokens are
    // reduced to 8-byte hashes, the vocab is one partial+final groupBy,
    // and the eval side left-joins on the hash (at 100 TB a real vocab is
    // still ≤ a few million rows, so AQE will broadcast it when it fits —
    // the plan degrades to a shuffle join, not to a failure, when it
    // doesn't). All emitted columns are integers.
    QueryDef("tx_vocab_coverage", Some(
      """WITH tok AS (SELECT doc_id, CAST(substr(source, 4) AS INT) AS src_n,
        |                    unnest(string_split(text,' ')) AS t
        |             FROM documents),
        |v AS (SELECT t FROM tok WHERE src_n < 15 GROUP BY t HAVING count(*) >= 100)
        |SELECT doc_id, count(*) AS n_tokens,
        |  count(*) FILTER (WHERE v.t IS NULL) AS n_oov,
        |  count(DISTINCT CASE WHEN v.t IS NULL THEN tok.t END) AS n_uniq_oov
        |FROM tok LEFT JOIN v ON tok.t = v.t WHERE src_n >= 15
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val tok = docs(s, d)
        .select(col("doc_id"),
          substring(col("source"), 4, 10).cast(IntegerType).as("src_n"),
          explode(toks).as("t"))
        .select(col("doc_id"), col("src_n"), xxhash64(col("t")).as("h"))
      val vocab = tok.filter(col("src_n") < 15)
        .groupBy(col("h")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 100)
        .select(col("h"), lit(true).as("in_vocab"))
      tok.filter(col("src_n") >= 15)
        .join(vocab, Seq("h"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          count(when(col("in_vocab").isNull, 1)).as("n_oov"),
          countDistinct(when(col("in_vocab").isNull, col("h"))).as("n_uniq_oov"))
        .orderBy(col("doc_id"))
    },

    // Boilerplate REMOVAL — the rewrite step downstream of dd_paragraph's
    // detection: drop every chunk whose content appears in more than one
    // distinct document (headers, license blocks, navigation chrome) and
    // REASSEMBLE each document from its surviving chunks, in order. This
    // is the CCNet/RefinedWeb-style shared-line scrub, with fixed 8-token
    // chunks standing in for lines (the corpus has no newlines; a real
    // corpus swaps the chunker, same plan). Scale shape: the frequency
    // pass exchanges only 8-byte chunk hashes (count-distinct-docs is a
    // two-phase partial+final aggregate); the surviving-hash frame is
    // boilerplate-sized (small by definition) and broadcast into a
    // LEFT ANTI join, so the corpus side streams through unshuffled; the
    // only corpus-sized exchange is the doc_id-keyed reassembly, which
    // carries exactly the output text once. Hash identity stands in for
    // chunk identity (the oracle groups by the chunk text itself, so a
    // collision would surface as a mismatch).
    QueryDef("tx_remove_boilerplate", Some(
      """WITH g AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |c AS (SELECT doc_id, t, unnest(range(0, CAST((len(t)-1)//8 AS BIGINT)+1)) AS ci FROM g),
        |e AS (SELECT doc_id, ci, array_to_string(t[ci*8+1:ci*8+8],' ') AS chunk FROM c),
        |f AS (SELECT chunk FROM e GROUP BY chunk HAVING count(DISTINCT doc_id) > 1),
        |k AS (SELECT doc_id, ci, chunk FROM e WHERE chunk NOT IN (SELECT chunk FROM f)),
        |r AS (SELECT doc_id, count(*) AS n_kept,
        |        string_agg(chunk, ' ' ORDER BY ci) AS clean_text
        |      FROM k GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(r.n_kept, 0) AS n_kept,
        |  COALESCE(r.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id
        |ORDER BY d.doc_id""".stripMargin)) { (s, d) =>
      val stride = 8
      val chunks = docs(s, d).select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(0L),
            floor((size(col("t")) - 1) / stride).cast(LongType))).as("ci"))
        .select(col("doc_id"), col("ci"),
          concat_ws(" ",
            slice(col("t"), (col("ci") * stride + 1).cast("int"), lit(stride))).as("chunk"))
        .withColumn("h", xxhash64(col("chunk")))
      val boiler = chunks.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1).select(col("h"))
      val rebuilt = chunks.join(broadcast(boiler), Seq("h"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          concat_ws(" ",
            transform(array_sort(collect_list(struct(col("ci"), col("chunk")))),
              x => x.getField("chunk"))).as("clean_text"))
      docs(s, d).select(col("doc_id"))
        .join(rebuilt, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
        .orderBy(col("doc_id"))
    },

    // Classifier TRAINING — the other half of tx_classify's
    // apply-the-trained-filter pass: fit a linear discriminant over the
    // 64-bucket hashed bag-of-words (fn_feature_hash's bucket function)
    // from a labeled train split. Task: language ID (label = lang 'en'),
    // the standard bootstrap for a fasttext-style corpus filter; a real
    // deployment swaps the label column. Weights are Laplace-smoothed
    // CLASS-RATE DIFFERENCES in integer micro-units —
    // w_b = floor(1e6·((pos_b+1)/(pos+64) − (neg_b+1)/(neg+64))) — the
    // integer-exact stand-in for NB log-odds (each division, the
    // subtraction and the scale are single correctly-rounded IEEE ops, so
    // both engines floor the same double; ln is libm-dependent and never
    // enters). Scale shape: ONE map-side-combining aggregate over ≤64×2
    // integer keys — training cost is a corpus scan, the model is 64 rows.
    // (Fixture honesty: the synthetic corpus shares a single 31-token
    // vocabulary across langs with near-uniform rates, so eval accuracy
    // sits near chance — the oracle gates the MATH, not model quality;
    // a real corpus gives the same plan a real signal.)
    QueryDef("tx_train_classifier", Some(
      s"""WITH b AS ($bucketedTokensSql),
        |cnt AS (SELECT bucket,
        |    count(*) FILTER (WHERE lang = 'en') AS n_pos,
        |    count(*) FILTER (WHERE lang <> 'en') AS n_neg
        |  FROM b WHERE source NOT IN ('src0','src1') GROUP BY bucket),
        |tot AS (SELECT sum(n_pos) AS pt, sum(n_neg) AS nt FROM cnt)
        |SELECT bucket, n_pos, n_neg,
        |  CAST(floor(1000000.0 * ((n_pos + 1.0)/(pt + 64.0)
        |    - (n_neg + 1.0)/(nt + 64.0))) AS BIGINT) AS w
        |FROM cnt CROSS JOIN tot ORDER BY bucket""".stripMargin)) { (s, d) =>
      trainedWeights(s, d).orderBy(col("bucket"))
    },

    // ...and the trained model APPLIED to the held-out split — the full
    // train→apply loop in one plan. The 64-row model is the bounded
    // driver-side artifact (same pattern as the IVF centroids / bloom
    // bytes): collected once, folded back in as a map LITERAL, so scoring
    // is one shuffle-free codegen pass over the eval docs — no explode,
    // no join, the same zero-exchange shape as tx_classify. Integer
    // sums end to end; eval-split accuracy is visible to the oracle as
    // (lang, pred_en) agreement.
    QueryDef("tx_train_apply", Some(
      s"""WITH b AS ($bucketedTokensSql),
        |cnt AS (SELECT bucket,
        |    count(*) FILTER (WHERE lang = 'en') AS n_pos,
        |    count(*) FILTER (WHERE lang <> 'en') AS n_neg
        |  FROM b WHERE source NOT IN ('src0','src1') GROUP BY bucket),
        |tot AS (SELECT sum(n_pos) AS pt, sum(n_neg) AS nt FROM cnt),
        |wt AS (SELECT bucket,
        |    CAST(floor(1000000.0 * ((n_pos + 1.0)/(pt + 64.0)
        |      - (n_neg + 1.0)/(nt + 64.0))) AS BIGINT) AS w
        |  FROM cnt CROSS JOIN tot),
        |sc AS (SELECT b.doc_id, CAST(sum(COALESCE(wt.w, 0)) AS BIGINT) AS score
        |  FROM b LEFT JOIN wt USING (bucket)
        |  WHERE b.source IN ('src0','src1') GROUP BY b.doc_id)
        |SELECT d.doc_id, d.lang, sc.score,
        |  CASE WHEN sc.score > 0 THEN 1 ELSE 0 END AS pred_en
        |FROM sc JOIN documents d USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin)) { (s, d) =>
      val w = trainedWeights(s, d).select(col("bucket"), col("w"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val wMap = map(w.flatMap { case (b, v) => Seq(lit(b), lit(v)) }: _*)
      val score = aggregate(
        transform(toks, t => coalesce(element_at(wMap, bucketOf(t)), lit(0L))),
        lit(0L), (acc, x) => acc + x)
      docs(s, d).filter(col("source").isin("src0", "src1"))
        .select(col("doc_id"), col("lang"), score.as("score"))
        .withColumn("pred_en", when(col("score") > 0, 1).otherwise(0))
        .orderBy(col("doc_id"))
    },

    // Keyword extraction: each doc's top-3 terms by tf/df — the TF-IDF
    // ranking with the idf log dropped (log is monotone in 1/df, so the
    // per-doc ORDER is identical) to keep the score one IEEE division
    // both engines compute bit-identically. Scale shape: tf is a
    // (doc, term) map-side-combined aggregate, df reuses tf's frame
    // (term-keyed, vocab-sized), the join hashes on term, and the
    // per-doc top-3 is the topk_min bounded heap (partial+final, ~3
    // rows per doc cross the final exchange) — NO WindowExec, no
    // per-doc sort of the full posting list. Deterministic: ties break
    // on term ascending inside the heap's struct order.
    QueryDef("tx_keywords", Some(
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id, term, tf, df,
        |    CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) DESC, term) AS rnk
        |  FROM tf JOIN df USING (term))
        |SELECT doc_id, rnk, term, tf, df, score
        |FROM sc WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin)) { (s, d) =>
      import graft.functions.topk_min
      val tf = docs(s, d)
        .select(col("doc_id"), explode(toks).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val score = col("tf").cast(DoubleType) / col("df").cast(DoubleType)
      tf.join(df, Seq("term"))
        .groupBy(col("doc_id"))
        .agg(topk_min(struct((-score).as("ns"), col("term").as("term"),
          col("tf").as("tf"), col("df").as("df")), 3).as("tk"))
        .select(col("doc_id"), posexplode(col("tk")).as(Seq("p", "st")))
        .select(col("doc_id"), (col("p") + 1).as("rnk"),
          col("st.term").as("term"), col("st.tf").as("tf"),
          col("st.df").as("df"), (-col("st.ns")).as("score"))
        .orderBy(col("doc_id"), col("rnk"))
    },

    // Rule-based suffix stemming + the vocabulary-collapse report: which
    // stems absorb the most surface variants (the normalization step
    // before vocabulary building / fuzzy matching). The stemmer is ONE
    // CASE expression over LIKE/left/length — ANSI constructs both
    // engines implement identically — and the SAME text is compiled by
    // Spark's expr() and run by DuckDB, so the two sides cannot drift.
    // Scale: tokens explode once, the stem is a codegen'd scalar map,
    // count(DISTINCT variant) per stem is Spark's two-phase distinct
    // aggregate (stem-keyed, vocab-sized), top-50 is a bounded heap.
    QueryDef("tx_stem_vocab", Some(
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
        |s AS (SELECT t, ${TextQueries.stemCase} AS stem FROM tok),
        |g AS (SELECT stem, count(DISTINCT t) AS n_variants, count(*) AS n_tokens
        |      FROM s GROUP BY stem)
        |SELECT stem, n_variants, n_tokens
        |FROM g ORDER BY n_variants DESC, stem LIMIT 50""".stripMargin)) { (s, d) =>
      docs(s, d)
        .select(explode(toks).as("t"))
        .select(col("t"), expr(TextQueries.stemCase).as("stem"))
        .groupBy(col("stem"))
        .agg(countDistinct(col("t")).as("n_variants"),
          count(lit(1)).as("n_tokens"))
        .orderBy(col("n_variants").desc, col("stem"))
        .limit(50)
    },

    // Collocation mining: the top-100 bigrams by LIFT — observed bigram
    // probability over the product of its words' unigram probabilities.
    // Lift is the PMI statistic without the log (log is monotone, so the
    // RANKING is identical), which keeps the score a pure IEEE
    // mul/div chain both engines evaluate bit-identically — ln() would
    // differ between libm implementations and break the hash gate. Min
    // support 5 drops hapax pairs whose lift is pure noise (the standard
    // collocation-extraction practice). Scale: tokens explode once,
    // unigram/bigram counts are map-side-combined aggregates, the two
    // vocab joins hash on the word (vocab-sized, not corpus-sized), and
    // the top-100 is a TakeOrderedAndProject bounded heap — no full sort,
    // no driver collect. Deterministic total order: (lift DESC, x, y).
    QueryDef("tx_collocations", Some(
      """WITH t AS (SELECT string_split(text,' ') AS t FROM documents),
        |tok AS (SELECT unnest(t) AS w FROM t),
        |uni AS (SELECT w, count(*) AS c_w FROM tok GROUP BY w),
        |bg0 AS (SELECT unnest([{'x': t[i], 'y': t[i+1]} FOR i IN range(1, len(t))]) AS p FROM t),
        |bg AS (SELECT p.x AS x, p.y AS y FROM bg0),
        |n AS (SELECT count(*) AS n_tok FROM tok),
        |m AS (SELECT count(*) AS m_bg FROM bg),
        |cand AS (SELECT x, y, count(*) AS c_xy FROM bg GROUP BY x, y HAVING count(*) >= 5)
        |SELECT x, y, c_xy, ux.c_w AS c_x, uy.c_w AS c_y,
        |  CAST(c_xy AS DOUBLE) / CAST(m_bg AS DOUBLE)
        |    / (CAST(ux.c_w AS DOUBLE) / CAST(n_tok AS DOUBLE))
        |    / (CAST(uy.c_w AS DOUBLE) / CAST(n_tok AS DOUBLE)) AS lift
        |FROM cand
        |JOIN uni ux ON ux.w = cand.x
        |JOIN uni uy ON uy.w = cand.y
        |CROSS JOIN n CROSS JOIN m
        |ORDER BY lift DESC, x, y LIMIT 100""".stripMargin)) { (s, d) =>
      val t = toks
      val base = docs(s, d).select(t.as("t"))
      val tok = base.select(explode(col("t")).as("w"))
      val uni = tok.groupBy(col("w")).agg(count(lit(1)).as("c_w"))
      val pairs = filter(
        zip_with(col("t"), slice(col("t"), lit(2), size(col("t"))),
          (a, b) => struct(a.as("x"), b.as("y"))),
        p => p.getField("y").isNotNull)
      val bg = base.select(explode(pairs).as("p"))
        .select(col("p.x").as("x"), col("p.y").as("y"))
      val nTok = tok.agg(count(lit(1)).as("n_tok"))
      val mBg = bg.agg(count(lit(1)).as("m_bg"))
      val cand = bg.groupBy(col("x"), col("y")).agg(count(lit(1)).as("c_xy"))
        .filter(col("c_xy") >= 5)
      val lift = col("c_xy").cast(DoubleType) / col("m_bg").cast(DoubleType) /
        (col("c_x").cast(DoubleType) / col("n_tok").cast(DoubleType)) /
        (col("c_y").cast(DoubleType) / col("n_tok").cast(DoubleType))
      cand
        .join(uni.select(col("w").as("x"), col("c_w").as("c_x")), Seq("x"))
        .join(uni.select(col("w").as("y"), col("c_w").as("c_y")), Seq("y"))
        .crossJoin(broadcast(nTok)).crossJoin(broadcast(mBg))
        .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
          lift.as("lift"))
        .orderBy(col("lift").desc, col("x"), col("y"))
        .limit(100)
    },

    // Learned-subword tokenizer TRAINING (byte-pair encoding) — the
    // vocabulary a pretraining pipeline learns once per corpus. The
    // Ivf.train decomposition: the corpus is touched only by the
    // distributed word count; the iterative merge loop runs on the
    // driver over the bounded word-frequency table (top maxWords by
    // count desc, word asc — TakeOrderedAndProject, per-partition
    // heaps), exactly how production BPE trainers consume a pre-counted
    // word table. The merge artifact round-trips through IndexStore
    // (train → persist → load → emit), so the emitted table IS the
    // production artifact. No SQL oracle (iterative merging is not
    // SQL); GateCheck holds rule uniqueness + the apply-side round-trip
    // and compression gates; BpeSpec pins the hand-computable classic
    // fixture (low/lower/newest/widest → es, est, est</w>, lo).
    QueryDef("tx_bpe_train", None) { (s, d) =>
      import s.implicits._
      val merges = bpeMerges(s, d)
      // Per-invocation root (pid + counter, keep-2 eviction) — a path
      // content-addressed by dataset alone races concurrent same-JVM
      // runs (one overwrites while the other loads) and ignores the
      // bpe confs (merges/maxWords) that shape the artifact.
      val path = StreamingQueries.invocationStore(s, "bpe", d)
      graft.operators.IndexStore.saveMerges(s, path, merges)
      graft.operators.IndexStore.loadMerges(s, path)
        .zipWithIndex.map { case ((a, b), r) => (r.toLong, a, b) }
        .toDF("rank", "left", "right").orderBy(col("rank"))
    },

    // Tokenizer INFERENCE over the corpus: the imperative BPE kernel
    // (operators.Bpe.encode, lowest-rank-pair-first — the standard
    // algorithm) runs once per DISTINCT word (bounded mapPartitions over
    // the word table, broadcast ranks); per-document tokenization is
    // pure relational work — posexplode, join on word, position-ordered
    // reassembly — so at 100 TB the per-doc cost is a join against the
    // zipf-bounded word→tokens table, never a per-occurrence kernel
    // call. Output is integer counts + an order-exact stream
    // fingerprint; GateCheck reconstructs every document from its token
    // stream and holds the round-trip to zero mismatches at both SFs.
    QueryDef("tx_bpe_apply", None) { (s, d) =>
      val merges = bpeMerges(s, d)
      bpeTokenized(s, d, merges)
        .select(col("doc_id"), col("n_words"), col("n_tokens"),
          md5(col("tok_stream")).as("tok_fp"))
        .orderBy(col("doc_id"))
    }
  )

  // ---- BPE tokenizer (operators.Bpe): train on the word table, apply by join

  /** Distributed word count → bounded driver merge loop ([[graft.operators.Bpe.train]]).
    * The collect is capped by `spark.graft.bpe.maxWords` with a total
    * deterministic order (count desc, word asc); `spark.graft.bpe.merges`
    * bounds the learned rule count. */
  private[graft] def bpeMerges(s: SparkSession, d: String): Seq[(String, String)] = {
    val nMerges = s.conf.get("spark.graft.bpe.merges", "200").toInt
    val maxWords = s.conf.get("spark.graft.bpe.maxWords", "50000").toInt
    val wt = docs(s, d)
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    graft.operators.Bpe.train(wt, nMerges)
  }

  /** Tokenized corpus under a learned merge table — one row per doc:
    * (doc_id, n_words, n_tokens, tok_stream), tok_stream the
    * space-joined token sequence in document order (each word's last
    * token carries the `</w>` sentinel, so stripping separators and
    * mapping the sentinel back to a space reproduces the text exactly —
    * the round-trip identity GateCheck and BpeSpec hold). */
  private[graft] def bpeTokenized(s: SparkSession, d: String,
      merges: Seq[(String, String)]): DataFrame = {
    import s.implicits._
    val ranksB = s.sparkContext.broadcast(merges.zipWithIndex.toMap)
    val words = docs(s, d)
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .distinct()
    val wordToks = words.as[String].mapPartitions { it =>
      val r = ranksB.value
      it.map(w => (w, graft.operators.Bpe.encode(w, r).toSeq))
    }.toDF("w", "toks")
    docs(s, d)
      .select(col("doc_id"),
        posexplode(split(coalesce(col("text"), lit("")), " ")).as(Seq("pos", "w")))
      .join(wordToks, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("toks"))).as("n_tokens"),
        concat_ws(" ", flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("toks")))),
          st => st.getField("toks")))).as("tok_stream"))
  }

  /** fn_feature_hash's bucket function: first 4 md5 hex chars mod 64 —
    * cross-engine exact (see FunctionQueries.fn_feature_hash). */
  private[queries] def bucketOf(t: Column): Column =
    conv(substring(md5(t), 1, 4), 16, 10).cast(LongType) % 64

  /** The suffix-strip stemmer as ONE CASE expression over the token
    * column `t` — only LIKE / left / length / || (ANSI constructs Spark
    * and DuckDB implement identically), so the same text serves as the
    * Spark expr() and the oracle SQL. Rules in first-match order with
    * min-stem-length guards; 'ies'→'y' precedes the plain 'es'/'s'
    * strips, 'ss' never loses its s. (Lazy: referenced from `defs`.) */
  private[queries] lazy val stemCase: String =
    """CASE
      | WHEN t LIKE '%ing' AND length(t) > 6 THEN left(t, length(t)-3)
      | WHEN t LIKE '%ies' AND length(t) > 5 THEN left(t, length(t)-3) || 'y'
      | WHEN t LIKE '%ed' AND length(t) > 5 THEN left(t, length(t)-2)
      | WHEN t LIKE '%es' AND length(t) > 5 THEN left(t, length(t)-2)
      | WHEN t LIKE '%ly' AND length(t) > 5 THEN left(t, length(t)-2)
      | WHEN t LIKE '%s' AND t NOT LIKE '%ss' AND length(t) > 4 THEN left(t, length(t)-1)
      | ELSE t END""".stripMargin.replace("\n", "")

  /** ONE oracle for the bigram-LM surprisal report, shared by the batch
    * score (tx_lm_surprisal) and the model-maintenance twin
    * (ss_lm_maintain) — the maintained unigram/bigram count stores sum to
    * the batch model exactly (counts are additive), so both reach the
    * identical integer report. (Lazy: referenced from `defs`.) */
  private[queries] lazy val lmSurprisalSql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
      |u AS (SELECT t, count(*) AS cu FROM tok GROUP BY t),
      |vv AS (SELECT count(*) AS v FROM u),
      |g AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i
      |      FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents)),
      |bg AS (SELECT doc_id, t[i] AS w1, array_to_string(t[i:i+1],' ') AS b FROM g),
      |bv AS (SELECT b, count(*) AS cb FROM bg GROUP BY b)
      |SELECT bg.doc_id AS doc_id, count(*) AS n_bigrams,
      |  CAST(sum(length(bin(cu + v)) - length(bin(cb + 1))) AS BIGINT) AS surprisal_bits,
      |  CAST(max(length(bin(cu + v)) - length(bin(cb + 1))) AS BIGINT) AS max_bits,
      |  (1000 * CAST(sum(length(bin(cu + v)) - length(bin(cb + 1))) AS BIGINT))
      |    // count(*) AS milli_bits_per_bigram
      |FROM bg JOIN bv USING (b) JOIN u ON bg.w1 = u.t CROSS JOIN vv
      |GROUP BY bg.doc_id ORDER BY doc_id""".stripMargin

  /** Per-doc bigram instances keyed by the 8-byte hashes of the first
    * token (`hw`, the conditioning unigram) and the bigram (`hb`) —
    * shared by tx_lm_surprisal and ss_lm_maintain so the scoring pass
    * and the model keys cannot drift. */
  private[graft] def lmBigramPairs(
      docsDf: DataFrame, spread: Boolean = false): DataFrame = {
    // spread=true for CORPUS-scale inputs: the tokenize+hash explode is
    // scan-side CPU and the fixture scan is one task (single row group)
    // — one text exchange buys a core-wide pass. Left false for the
    // per-micro-batch fold inputs (already in-memory, AQE-sized).
    val wide =
      if (spread)
        graft.operators.Spread.toCores(docsDf.select(col("doc_id"), col("text")))
      else docsDf
    val t = toks
    val pairs = filter(
      zip_with(t, slice(t, lit(2), size(t)),
        (a, b) => struct(a.as("w1"), concat(a, lit(" "), b).as("b"))),
      x => x.getField("b").isNotNull)
    wide
      .select(col("doc_id"), explode(pairs).as("p"))
      .select(col("doc_id"), xxhash64(col("p.w1")).as("hw"),
        xxhash64(col("p.b")).as("hb"))
  }

  /** The surprisal scoring pass from the model tables: `uni` = (hw, cu)
    * unigram counts, `bi` = (hb, cb) bigram counts, `bg` = per-doc
    * bigram instances. ONE definition for both the batch-built and the
    * stream-maintained model, so the quantized-bits formula cannot
    * diverge between them. */
  private[queries] def lmScore(bg: DataFrame, uni: DataFrame, bi: DataFrame): DataFrame = {
    val vocabSize = uni.agg(count(lit(1)).as("v"))
    val bits = length(bin(col("cu") + col("v"))) - length(bin(col("cb") + 1))
    bg.join(bi, Seq("hb")).join(uni, Seq("hw"))
      .crossJoin(broadcast(vocabSize))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(bits).cast(LongType).as("surprisal_bits"),
        max(bits).cast(LongType).as("max_bits"))
      .withColumn("milli_bits_per_bigram",
        expr("(1000 * surprisal_bits) div n_bigrams"))
      .orderBy(col("doc_id"))
  }

  private[queries] def bucketedTokensSql: String =
    """SELECT doc_id, lang, source,
      |   ((strpos('0123456789abcdef', substr(md5(t),1,1))-1)*4096
      |   +(strpos('0123456789abcdef', substr(md5(t),2,1))-1)*256
      |   +(strpos('0123456789abcdef', substr(md5(t),3,1))-1)*16
      |   +(strpos('0123456789abcdef', substr(md5(t),4,1))-1)) % 64 AS bucket
      | FROM (SELECT doc_id, lang, source, unnest(string_split(text,' ')) AS t
      |       FROM documents)""".stripMargin

  /** The trained 64-row model: per-bucket smoothed class-rate-difference
    * weights from the train split (every source except the two held out). */
  private[queries] def trainedWeights(s: SparkSession, d: String): DataFrame = {
    val cnt = docs(s, d).filter(!col("source").isin("src0", "src1"))
      .select(col("lang"), explode(toks).as("t"))
      .select((col("lang") === "en").as("pos"), bucketOf(col("t")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("n_neg"))
    val tot = cnt.agg(sum(col("n_pos")).as("pt"), sum(col("n_neg")).as("nt"))
    cnt.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_pos"), col("n_neg"),
        floor(lit(1000000.0) *
          ((col("n_pos") + 1.0) / (col("pt") + 64.0)
            - (col("n_neg") + 1.0) / (col("nt") + 64.0))).cast(LongType).as("w"))
  }
}
