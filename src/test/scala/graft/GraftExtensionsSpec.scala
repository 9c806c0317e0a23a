package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of graft's custom expressions, registered through
  * SparkSessionExtensions. */
class GraftExtensionsSpec extends AnyFunSuite {

  // withExtensions only applies at session CREATION, and suites share the
  // forked JVM — stop any live session first (suites run sequentially in
  // forked mode; later suites' getOrCreate will just reuse this one, the
  // extra functions are harmless there).
  private lazy val spark: SparkSession = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = GraftSession.configure(
      SparkSession.builder()
        .master("local[4]")
        .appName("graft-ext")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("custom expressions are callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |             array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cs,
        |  dot_product(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS dp,
        |  simhash64(array('a','b')) AS sh,
        |  size(minhash_sig(array('a','b','c','d'))) AS msize,
        |  lsh_bucket(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT)), 7, 4) AS bkt
        |""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 6.0)
    assert(r.getLong(2) != 0L)
    assert(r.getInt(3) == 64)
    assert(r.getInt(4) >= 0 && r.getInt(4) < 16)
  }

  test("ngram/top-ngram codegen agrees with a naive reference on random docs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val vocab = Vector("aa", "bb", "cc", "dd", "e", "", "longertoken")
    val docs = (0 until 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def naiveGrams(text: String, w: Int): Seq[String] =
      text.split(" ", -1).toSeq.sliding(w).filter(_.size == w).map(_.mkString(" ")).toSeq
    val rows = docs.toDF("id", "text")
      .select(col("id"), col("text"),
        size(graft.functions.ngram_hashes(split(col("text"), " "), 2)).as("nh"),
        graft.functions.top_ngram(split(col("text"), " "), 2).as("tp"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(1)
      val grams = naiveGrams(text, 2)
      assert(r.getInt(2) == grams.distinct.size,
        s"distinct bigram-hash count for '$text'")
      if (grams.isEmpty) assert(r.isNullAt(3), s"'$text' has no bigrams")
      else {
        val tp = r.getStruct(3)
        val maxC = grams.groupBy(identity).values.map(_.size).max
        val expect = grams.groupBy(identity).collect {
          case (g, occ) if occ.size == maxC => g
        }.min
        assert(tp.getString(0) == expect && tp.getLong(1) == maxC,
          s"top bigram of '$text': got (${tp.getString(0)}, ${tp.getLong(1)})")
      }
    }
  }

  test("both optimizer rules arrive via the extensions path (not just extraOptimizations)") {
    import org.apache.spark.sql.functions._
    // interval rewrite: armed by conf, plan loses its nested loop
    spark.conf.set(graft.plans.IntervalJoinRewrite.WidthKey, "64")
    spark.conf.set(graft.plans.TopKWindowRewrite.MaxKKey, "10")
    try {
      val g = spark.range(200).select(col("id"),
        (col("id") * 13 % 500).as("s"), (col("id") * 13 % 500 + 40).as("e"))
      val a = g.select(col("id").as("a_id"), col("s").as("a_s"), col("e").as("a_e"))
      val b = g.select(col("id").as("b_id"), col("s").as("b_s"), col("e").as("b_e"))
      val joined = a.join(b, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      assert(!joined.queryExecution.optimizedPlan.toString.contains("Join Inner, ((a_s"),
        "interval rule should have rewritten the inequality join")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id") % 5).orderBy(col("s"), col("id"))
      val ranked = g.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      val opt = ranked.queryExecution.optimizedPlan.toString
      assert(opt.contains("window_topk") && !opt.contains("Window ["),
        s"topk rule should have rewritten the window:\n$opt")
    } finally {
      spark.conf.unset(graft.plans.IntervalJoinRewrite.WidthKey)
      spark.conf.unset(graft.plans.TopKWindowRewrite.MaxKKey)
    }
  }

  test("topk_min is callable from SQL and aggregates per group") {
    import spark.implicits._
    (0 until 100).map(i => (i % 4, i)).toDF("grp", "v")
      .createOrReplaceTempView("topk_sql_t")
    val rows = spark.sql(
      "SELECT grp, topk_min(v, 3) AS tk FROM topk_sql_t GROUP BY grp ORDER BY grp")
      .collect().map(r => (r.getInt(0), r.getSeq[Int](1)))
    assert(rows.toSeq == Seq(
      (0, Seq(0, 4, 8)), (1, Seq(1, 5, 9)), (2, Seq(2, 6, 10)), (3, Seq(3, 7, 11))))
  }

  test("topk_max is callable from SQL: k largest, descending, works on strings") {
    import spark.implicits._
    (0 until 100).map(i => (i % 4, i)).toDF("grp", "v")
      .createOrReplaceTempView("topk_max_sql_t")
    val rows = spark.sql(
      "SELECT grp, topk_max(v, 3) AS tk FROM topk_max_sql_t GROUP BY grp ORDER BY grp")
      .collect().map(r => (r.getInt(0), r.getSeq[Int](1)))
    assert(rows.toSeq == Seq(
      (0, Seq(96, 92, 88)), (1, Seq(97, 93, 89)), (2, Seq(98, 94, 90)), (3, Seq(99, 95, 91))))
    // descending STRINGS — the case negation encoding could never cover
    val sRows = spark.sql(
      "SELECT topk_max(concat('u', lpad(CAST(v AS STRING), 3, '0')), 2) AS tk FROM topk_max_sql_t")
      .collect().map(_.getSeq[String](0))
    assert(sRows.head == Seq("u099", "u098"))
  }

  test("ngram_hashes and top_ngram are callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  size(ngram_hashes(array('a','b','a','b'), 2)) AS uniq_bigrams,
        |  top_ngram(array('a','b','a','b','a'), 2) AS tp,
        |  top_ngram(array('solo'), 2) AS none
        |""".stripMargin).head()
    assert(r.getInt(0) == 2) // "a b", "b a", "a b" -> 2 distinct
    val tp = r.getStruct(1)
    assert(tp.getString(0) == "a b" && tp.getLong(1) == 2L)
    assert(r.isNullAt(2))
  }
}
