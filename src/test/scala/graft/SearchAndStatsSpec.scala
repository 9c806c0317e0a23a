package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics tests for the lexical-search and corpus-reporting queries
  * (`srch_bm25`, `dd_cross_dedup`, `tx_corpus_stats`) on hand-built
  * fixtures where the expected answer is computable by hand — the
  * value-level gate on the driver fixtures is the DuckDB oracle. */
class SearchAndStatsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = GraftSession.local(4)

  /** Write a documents table with the driver fixture's schema and return
    * its directory. */
  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("graft-search-fixture").toString
    val s = spark
    import s.implicits._
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- srch_bm25 -------------------------------------------------------

  test("bm25: exact score on a hand-computed corpus") {
    // 4 docs, terms spark/merge/window; doc 0 holds 2 'spark' + 1 'merge'
    val dir = docsDir(Seq(
      (0L, "spark spark merge pad pad pad", "en", "src1"),
      (1L, "spark pad pad pad pad pad", "en", "src1"),
      (2L, "window pad pad pad pad pad", "en", "src1"),
      (3L, "pad pad pad pad pad pad", "en", "src1")))
    val rows = SparkEntry.queries("srch_bm25")(spark, dir).collect()
    // every doc has dl=6, avgdl=6 → length norm is 1; denom = tf + k1
    val k1 = 1.2
    def idf(df: Int) = math.log(1 + (4 - df + 0.5) / (df + 0.5))
    def tfw(tf: Int) = tf * (k1 + 1) / (tf + k1)
    val expected = Map(
      0L -> (idf(2) * tfw(2) + idf(1) * tfw(1)), // spark df=2, merge df=1
      1L -> idf(2) * tfw(1),
      2L -> idf(1) * tfw(1),
      3L -> 0.0)
    // doc2's single rare term (df=1 → idf ln(10/3)) outscores doc1's
    // common one (df=2 → idf ln 2)
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 2L, 1L, 3L), "rank order")
    assert(rows.map(_.getInt(1)).toSeq == Seq(1, 2, 3, 4), "contiguous ranks")
    rows.foreach { r =>
      val want = math.floor(expected(r.getLong(0)) * 1e6).toLong
      assert(r.getLong(2) == want, s"doc ${r.getLong(0)}: got ${r.getLong(2)}, want $want")
    }
  }

  test("bm25: longer documents score below shorter ones at equal tf") {
    val dir = docsDir(Seq(
      (0L, "spark pad", "en", "src1"),
      (1L, "spark " + Seq.fill(20)("pad").mkString(" "), "en", "src1"),
      (2L, "pad pad", "en", "src1")))
    val rows = SparkEntry.queries("srch_bm25")(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq.take(2) == Seq(0L, 1L),
      "short doc outranks long doc at equal tf")
  }

  // ---- dd_cross_dedup --------------------------------------------------

  test("cross-dedup flags shuffled token-set copies of eval docs, counts matches") {
    val dir = docsDir(Seq(
      (0L, "alpha beta gamma", "en", "src0"), // eval
      (1L, "gamma beta alpha alpha", "en", "src0"), // eval, same token SET
      (2L, "beta alpha gamma gamma", "en", "src3"), // train: shuffled copy → 2 eval matches
      (3L, "alpha beta delta", "en", "src3"), // train: different set → clean
      (4L, "alpha beta gamma", "en", "src4"))) // train: exact copy → 2 eval matches
    val rows = SparkEntry.queries("dd_cross_dedup")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(2L -> 2L, 4L -> 2L), s"got $rows")
  }

  // ---- tx_classify -----------------------------------------------------

  test("classifier score equals the hand-computed hashed-weight sum") {
    val dir = docsDir(Seq(
      (0L, "alpha beta", "en", "src1"),
      (1L, "alpha alpha alpha", "en", "src1")))
    def w(token: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(token.getBytes("UTF-8"))
      ((md5(0) >> 4) & 0xf).toLong - 8
    }
    val rows = SparkEntry.queries("tx_classify")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(rows(0L) == ((2L, w("alpha") + w("beta"), if (w("alpha") + w("beta") >= 0) 1 else 0)))
    assert(rows(1L) == ((3L, 3 * w("alpha"), if (3 * w("alpha") >= 0) 1 else 0)))
  }

  // ---- dd_fuzzy_names --------------------------------------------------

  test("fuzzy name matching pairs vocabulary entries within edit distance 2") {
    val dir = Files.createTempDirectory("graft-fuzzy-fixture").toString
    val s = spark
    import s.implicits._
    // names: gear/geer dist 1; gear/gears dist 1; geer/gears dist 2;
    // widget is 2+ length away OR distance > 2 from all; duplicates of
    // 'gear' collapse in the distinct pass
    Seq((1L, "gear", "b", "t", 1, 1.0), (2L, "geer", "b", "t", 1, 1.0),
      (3L, "gears", "b", "t", 1, 1.0), (4L, "widget", "b", "t", 1, 1.0),
      (5L, "gear", "b", "t", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val rows = SparkEntry.queries("dd_fuzzy_names")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set(("gear", "gears", 1L), ("gear", "geer", 1L), ("gears", "geer", 2L)),
      s"got $rows")
  }

  // ---- fn_zscore / fn_histogram ---------------------------------------

  test("z-scores have zero mean and unit variance over the driver fixture") {
    val z = SparkEntry.queries("fn_zscore")(spark, "/root/testdata/sf0.001")
      .collect().map(_.getDouble(2))
    val mean = z.sum / z.length
    val varr = z.map(v => (v - mean) * (v - mean)).sum / z.length
    assert(math.abs(mean) < 1e-9, s"mean $mean")
    assert(math.abs(varr - 1.0) < 1e-9, s"variance $varr")
  }

  test("histogram buckets partition the rows and cover [min, max]") {
    val rows = SparkEntry.queries("fn_histogram")(spark, "/root/testdata/sf0.001").collect()
    val total = rows.map(_.getLong(1)).sum
    val n = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").count()
    assert(total == n, "every row lands in exactly one bucket")
    assert(rows.map(_.getLong(0)).toSet.subsetOf((0L to 15L).toSet))
    // bucket_lo must rise strictly with the bucket index (equal-width bins)
    val byBucket = rows.sortBy(_.getLong(0)).map(_.getDouble(2))
    assert(byBucket.zip(byBucket.tail).forall { case (a, b) => a < b },
      s"bucket_lo not strictly increasing: ${byBucket.mkString(",")}")
  }

  test("degenerate inputs: constant feature gives z=0; constant column gives one bucket") {
    val dir = Files.createTempDirectory("graft-degenerate-fixture").toString
    val s = spark
    import s.implicits._
    Seq((1L, "a", "b", "t", 7, 1.0), (2L, "a", "b", "t", 7, 2.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val z = SparkEntry.queries("fn_zscore")(spark, dir).collect()
    assert(z.forall(_.getDouble(2) == 0.0), "constant feature standardizes to 0, not NaN")
    Seq((1L, 10L, "O", 500.0, new java.sql.Timestamp(0L), "1-URGENT"),
      (2L, 11L, "O", 500.0, new java.sql.Timestamp(0L), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val h = SparkEntry.queries("fn_histogram")(spark, dir).collect()
    assert(h.length == 1 && h.head.getLong(0) == 0 && h.head.getLong(1) == 2,
      s"all-equal column collapses to bucket 0: ${h.mkString(",")}")
  }

  // ---- tx_corpus_stats -------------------------------------------------

  test("corpus stats: discrete percentiles pick the ceil(p*n) element per source") {
    // src1: n_chars 1,2,3,4,5 (p50 → 3rd = 3, p95 → ceil(4.75)=5th = 5)
    val texts = Seq("a", "ab", "abc", "abcd", "abcde")
    val dir = docsDir(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, if (i < 2) "en" else "de", "src1") } :+
        (9L, "xx yy", "fr", "src2"))
    val rows = SparkEntry.queries("tx_corpus_stats")(spark, dir).collect()
    assert(rows.length == 2)
    val src1 = rows.find(_.getString(0) == "src1").get
    assert(src1.getLong(1) == 5, "n_docs")
    assert(src1.getLong(2) == 5, "total_tokens: five 1-token docs")
    assert(src1.getLong(3) == 2, "n_langs")
    assert(src1.getLong(4) == 3, "p50 = 3rd of 5")
    assert(src1.getLong(5) == 5, "p95 = 5th of 5")
    val src2 = rows.find(_.getString(0) == "src2").get
    assert(src2.getLong(1) == 1 && src2.getLong(2) == 2 &&
      src2.getLong(4) == 5 && src2.getLong(5) == 5)
  }

  // ---- tx_bigram_rarity ------------------------------------------------

  test("bigram rarity: hand-computed counts, hapax flags, and corpus mass") {
    // corpus bigrams: 'a b' x3 (two in doc 0, one in doc 1), 'b a' x1,
    // 'b c' x1; doc 2 has a single token and therefore no bigram row
    val dir = docsDir(Seq(
      (0L, "a b a b", "en", "src1"),
      (1L, "a b c", "en", "src1"),
      (2L, "x", "en", "src1")))
    val rows = SparkEntry.queries("tx_bigram_rarity")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == Set(0L, 1L), "single-token doc contributes no bigrams")
    assert(rows(0L) == ((3L, 1L, 7L)), s"doc 0: 3 bigrams, 'b a' hapax, mass 3+1+3: ${rows(0L)}")
    assert(rows(1L) == ((2L, 1L, 4L)), s"doc 1: 2 bigrams, 'b c' hapax, mass 3+1: ${rows(1L)}")
  }

  // ---- tx_lm_surprisal ---------------------------------------------------

  test("lm surprisal: hand-computed bit-quantized conditional log-probs") {
    // unigrams: a=3 b=3 c=1 x=1 (V=4); bigrams: 'a b'=3, 'b a'=1, 'b c'=1.
    // bits(w1,w2) = len(bin(cu(w1)+V)) - len(bin(cb+1)):
    //   'a b': len(bin(7))=3, len(bin(4))=3 -> 0
    //   'b a': len(bin(7))=3, len(bin(2))=2 -> 1
    //   'b c': len(bin(7))=3, len(bin(2))=2 -> 1
    val dir = docsDir(Seq(
      (0L, "a b a b", "en", "src1"),
      (1L, "a b c", "en", "src1"),
      (2L, "x", "en", "src1")))
    val rows = SparkEntry.queries("tx_lm_surprisal")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(rows.keySet == Set(0L, 1L), "single-token doc contributes no bigrams")
    assert(rows(0L) == ((3L, 1L, 1L, 333L)),
      s"doc 0: bigrams [ab,ba,ab] -> bits [0,1,0]: ${rows(0L)}")
    assert(rows(1L) == ((2L, 1L, 1L, 500L)),
      s"doc 1: bigrams [ab,bc] -> bits [0,1]: ${rows(1L)}")
  }

  test("lm surprisal: shuffled text scores above its natural original") {
    // doc 1 reuses doc 0's vocabulary but in never-seen adjacencies; with
    // three natural copies pinning the common bigrams, the garbled doc's
    // per-bigram surprisal must exceed every natural doc's — the filter
    // property the operator exists for.
    val natural = "the fast query runs on the fast engine"
    val garbled = "engine the on query fast runs the fast"
    val dir = docsDir(Seq(
      (0L, natural, "en", "src1"), (1L, natural, "en", "src1"),
      (2L, natural, "en", "src1"), (3L, garbled, "en", "src1")))
    val rows = SparkEntry.queries("tx_lm_surprisal")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(rows(3L) > rows(0L),
      s"garbled ${rows(3L)} milli-bits/bigram vs natural ${rows(0L)}")
  }

  // ---- emb_label_stats -------------------------------------------------

  test("embedding audit: exact scaled squared-norm profile per label") {
    val dir = Files.createTempDirectory("graft-emb-fixture").toString
    val s = spark
    import s.implicits._
    Seq(
      (0L, Seq(3.0f, 4.0f), 0),   // nsq 25  -> 25_000_000
      (1L, Seq(1.0f, 0.0f), 0),   // nsq 1   ->  1_000_000
      (2L, Seq(0.5f, 0.5f), 1),   // nsq 0.5 ->    500_000
      (3L, Seq.empty[Float], 1))  // empty vec: counted, norm skipped (DuckDB NULL parity)
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("emb_label_stats")(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(rows(0) == ((2L, 2L, 2L, 26000000L, 1000000L, 25000000L)), s"label 0: ${rows(0)}")
    assert(rows(1) == ((2L, 0L, 2L, 500000L, 500000L, 500000L)),
      s"label 1 counts the empty vector but its norm is skipped: ${rows(1)}")
  }

  // ---- dd_source_overlap -----------------------------------------------

  test("source overlap: asymmetric containment over shared 5-gram shingles") {
    // srcA: 6 tokens → 2 shingles; srcB: 5 tokens → 1 shingle, equal to
    // srcA's first; srcC: disjoint → appears in no pair row
    val dir = docsDir(Seq(
      (0L, "t1 t2 t3 t4 t5 t6", "en", "srcA"),
      (1L, "t1 t2 t3 t4 t5", "en", "srcB"),
      (2L, "x1 x2 x3 x4 x5", "en", "srcC")))
    val rows = SparkEntry.queries("dd_source_overlap")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(rows == Set(
      ("srcA", "srcB", 1L, 2L, 0.5),
      ("srcB", "srcA", 1L, 1L, 1.0)), s"got $rows")
  }

  // ---- op_anomaly_ewma ---------------------------------------------------

  test("ewma anomaly: hand-built series flags the planted spike and dip") {
    // one metric, 10 consecutive days: steady 16/day, a dip (2) planted on
    // day 7 and a spike (40) on day 10. The value-level gate on the driver
    // fixtures is the DuckDB oracle (hash-exact at sf0.001/0.01/0.1); this
    // pins the FLAG semantics on a series where the answer is computable by
    // hand — and guards against thresholds that silently never fire.
    val dir = Files.createTempDirectory("graft-ewma-fixture").toString
    val s = spark
    import s.implicits._
    val counts = Map(7 -> 2, 10 -> 40).withDefaultValue(16)
    (1 to 10).flatMap { day =>
      Seq.fill(counts(day))((java.sql.Timestamp.valueOf(f"2024-02-$day%02d 12:00:00"), "m"))
    }.toDF("ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("op_anomaly_ewma")(spark, dir).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(4), r.getInt(5), r.getInt(6))))
      .toMap
    assert(rows.size == 10)
    // weight-mass ramp: day1 has no history, day2 one lag, day9+ all eight
    assert(rows("2024-02-01")._2 == 0L)
    assert(rows("2024-02-02")._2 == 128L)
    assert(rows("2024-02-09")._2 == 255L && rows("2024-02-10")._2 == 255L)
    // day 10: EWMA of (16×7 then 2 at lag 3... ) is well under 40×4/5
    assert(rows("2024-02-10")._3 == 1, s"spike must fire: $rows")
    // day 7: rn=6 → den = 256 - 2^2 = 252; count 2 vs EWMA 16 → dip
    assert(rows("2024-02-07") ==(2L, 252L, 0, 1), s"dip must fire: $rows")
    // the steady head (inside the rn>=3 guard) stays quiet
    assert(rows("2024-02-05")._3 == 0 && rows("2024-02-05")._4 == 0)
    // days 1-3 are guard-silenced even though day 1 has zero history
    assert(rows("2024-02-02")._3 == 0 && rows("2024-02-02")._4 == 0)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("skyline: strict domination, same-x domination, duplicates kept") {
    // axes: x = n_chars (helper sets it to text.length), y = distinct
    // tokens. A(13,5)=B dup — both kept; C(13,4) loses to A on same x;
    // D(15,3) and E(11,6) are frontier corners; F(11,5) is strictly
    // dominated by A (13>11, 5>=5).
    val dir = docsDir(Seq(
      (0L, "a b c d e a a", "en", "s"),   // A (13,5)
      (1L, "a b c d e a a", "en", "s"),   // B duplicate of A
      (2L, "a b c d a a a", "en", "s"),   // C (13,4) dominated
      (3L, "a b c a a a a a", "en", "s"), // D (15,3)
      (4L, "a b c d e f", "en", "s"),     // E (11,6)
      (5L, "a b c d e a", "en", "s")))    // F (11,5) dominated
    val got = SparkEntry.queries("op_skyline")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 1L, 3L, 4L), s"got $got")
  }

  /** Write an events table with the driver fixture's schema. */
  private def eventsDir(rows: Seq[(Long, Long, String, String)]): String = {
    val dir = Files.createTempDirectory("graft-events-fixture").toString
    val s = spark
    import s.implicits._
    rows.map { case (eid, uid, tpe, ts) =>
      (eid, java.sql.Timestamp.valueOf(ts), uid, tpe, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("streaming funnel: strict-> anchors, stalls, and batch equality") {
    // user 1: view 10:00, click 10:00 (SAME ts — strict > must reject),
    // click 11:00 (anchors), purchase 10:30 (BEFORE the click — reject),
    // purchase 12:00 (completes). user 2: click with no view — excluded.
    // user 3: view only — stalled with null later stages.
    val dir = eventsDir(Seq(
      (1L, 1L, "view", "2024-05-01 10:00:00"),
      (2L, 1L, "click", "2024-05-01 10:00:00"),
      (3L, 1L, "click", "2024-05-01 11:00:00"),
      (4L, 1L, "purchase", "2024-05-01 10:30:00"),
      (5L, 1L, "purchase", "2024-05-01 12:00:00"),
      (6L, 2L, "click", "2024-05-01 09:00:00"),
      (7L, 3L, "view", "2024-05-01 08:00:00")))
    val batch = SparkEntry.queries("op_funnel")(spark, dir).collect().toSeq
    val saved = spark.conf.getOption("spark.graft.ssjoin.slices")
    try {
      Seq("1", "6").foreach { n =>
        spark.conf.set("spark.graft.ssjoin.slices", n)
        val streamed = SparkEntry.queries("ss_funnel")(spark, dir).collect().toSeq
        assert(streamed == batch, s"ss_funnel != op_funnel at $n slices")
      }
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.graft.ssjoin.slices", v)
        case None => spark.conf.unset("spark.graft.ssjoin.slices")
      }
    }
    val byUser = batch.map(r => r.getLong(0) -> r).toMap
    assert(byUser.keySet == Set(1L, 3L), s"user 2 (no view) must be absent: $batch")
    assert(!byUser(1L).isNullAt(2) && !byUser(1L).isNullAt(3), "user 1 completes")
    assert(byUser(3L).isNullAt(2) && byUser(3L).isNullAt(3), "user 3 stalls")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("streaming transitions: boundary pairs survive any batch cut") {
    // one user, 6 events — with 6 slices every adjacent pair CROSSES a
    // micro-batch boundary and must come out of the remembered state.
    val dir = eventsDir((1 to 6).map(i =>
      (i.toLong, 1L, Seq("view", "click")(i % 2), f"2024-05-01 1$i%d:00:00")))
    val batch = SparkEntry.queries("op_transitions")(spark, dir).collect().toSeq
    val saved = spark.conf.getOption("spark.graft.ssjoin.slices")
    try {
      Seq("1", "6").foreach { n =>
        spark.conf.set("spark.graft.ssjoin.slices", n)
        val streamed = SparkEntry.queries("ss_transitions")(spark, dir).collect().toSeq
        assert(streamed == batch, s"ss_transitions != op_transitions at $n slices")
      }
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.graft.ssjoin.slices", v)
        case None => spark.conf.unset("spark.graft.ssjoin.slices")
      }
    }
    // 5 adjacent pairs alternate click->view / view->click
    assert(batch.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet ==
      Set(("click", "view", 3L), ("view", "click", 2L)), s"got $batch")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("skyline: 400-point seeded fuzz equals the brute-force O(n^2) reference") {
    // random corpora where duplicate points, same-x ties and dense
    // frontiers all occur by construction; the two-phase bucketed plan
    // must reproduce the literal domination definition every time.
    val rnd = new scala.util.Random(20260815L)
    (1 to 3).foreach { round =>
      // text with controlled (n_chars, n_distinct): y distinct tokens,
      // padded with repeats of the first token to stretch length
      val rows = (0L until 400L).map { id =>
        val y = 1 + rnd.nextInt(12)
        val pad = rnd.nextInt(12)
        val toks = (0 until y).map(j => s"t$j") ++ Seq.fill(pad)("t0")
        (id, toks.mkString(" "), if (rnd.nextBoolean()) "en" else "de", "s")
      }
      val dir = docsDir(rows)
      val pts = rows.map { case (id, text, lang, _) =>
        (id, lang, text.length.toLong, text.split(" ").distinct.length.toLong)
      }
      val expected = pts.filter { case (_, lang, x, y) =>
        !pts.exists { case (_, l2, x2, y2) =>
          l2 == lang && x2 >= x && y2 >= y && (x2 > x || y2 > y)
        }
      }.map(_._1).toSet
      val got = SparkEntry.queries("op_skyline")(spark, dir)
        .collect().map(_.getLong(0)).toSet
      assert(got == expected, s"round $round: got ${got.size}, want ${expected.size}")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("skyline maintenance: drained frontier equals batch at any slicing") {
    // arrival order must not matter: the incremental fold (frontier ++
    // batch, re-skyline) is exact because domination is transitive.
    val dir = docsDir(Seq(
      (0L, "a b c d e a a", "en", "s"),
      (1L, "a b c d e a a", "en", "s"),
      (2L, "a b c d a a a", "en", "s"),
      (3L, "a b c a a a a a", "en", "s"),
      (4L, "a b c d e f", "en", "s"),
      (5L, "a b c d e a", "en", "s"),
      (6L, "x y z", "de", "s")))
    val batch = SparkEntry.queries("op_skyline")(spark, dir).collect().toSeq
    val saved = spark.conf.getOption("spark.graft.ssjoin.slices")
    try {
      Seq("2", "5").foreach { n =>
        spark.conf.set("spark.graft.ssjoin.slices", n)
        val streamed = SparkEntry.queries("ss_skyline_maintain")(spark, dir).collect().toSeq
        assert(streamed == batch, s"maintained frontier != batch at $n slices")
      }
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.graft.ssjoin.slices", v)
        case None => spark.conf.unset("spark.graft.ssjoin.slices")
      }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("ewma monitor: seeded random batch splits all equal the batch frame") {
    // beyond the fixed 2/7-slice check: 5 random slicings of a random
    // 40-day two-metric series — state must carry the EWMA tail across
    // ANY micro-batch cut.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260815L)
    val dir = java.nio.file.Files.createTempDirectory("graft-ewma-fuzz").toString
    val d0 = java.time.LocalDate.parse("2024-03-01")
    val rows = for {
      day <- 1 to 40
      m <- Seq("a", "b")
      c = 1 + rnd.nextInt(30)
      _ <- 1 to c
    } yield (java.sql.Timestamp.valueOf(s"${d0.plusDays(day - 1)} 12:00:00"), m)
    rows.toDF("ts", "event_type").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = SparkEntry.queries("op_anomaly_ewma")(spark, dir).collect().toSeq
    val saved = spark.conf.getOption("spark.graft.ssjoin.slices")
    try {
      (1 to 5).foreach { i =>
        spark.conf.set("spark.graft.ssjoin.slices", (1 + rnd.nextInt(10)).toString)
        val streamed = SparkEntry.queries("ss_anomaly_ewma")(spark, dir).collect().toSeq
        assert(streamed == batch, s"fuzz slicing $i diverged")
      }
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.graft.ssjoin.slices", v)
        case None => spark.conf.unset("spark.graft.ssjoin.slices")
      }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("ewma anomaly: streaming twin equals batch at any slice boundary") {
    // same planted series; the drained flatMapGroupsWithState monitor must
    // reproduce the batch frame bit-exactly whether the 10 days arrive in
    // 2 big micro-batches or 7 ragged ones (slice-boundary invariance is
    // the genuinely streaming property — state must carry the EWMA tail
    // across batch cuts).
    val dir = Files.createTempDirectory("graft-ewma-ss-fixture").toString
    val s = spark
    import s.implicits._
    val counts = Map(7 -> 2, 10 -> 40).withDefaultValue(16)
    (1 to 10).flatMap { day =>
      Seq.fill(counts(day))((java.sql.Timestamp.valueOf(f"2024-02-$day%02d 12:00:00"), "m"))
    }.toDF("ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = SparkEntry.queries("op_anomaly_ewma")(spark, dir).collect().toSeq
    val saved = spark.conf.getOption("spark.graft.ssjoin.slices")
    try {
      Seq("2", "7").foreach { n =>
        spark.conf.set("spark.graft.ssjoin.slices", n)
        val streamed = SparkEntry.queries("ss_anomaly_ewma")(spark, dir).collect().toSeq
        assert(streamed == batch, s"drained stream != batch at $n slices")
      }
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.graft.ssjoin.slices", v)
        case None => spark.conf.unset("spark.graft.ssjoin.slices")
      }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
