package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.bql.{Ast, BqlParseException, Compiler, Parser}
import graft.sources.Tables

/** BQL parser unit tests + property tests: compiled BQL must agree with
  * the equivalent hand-written DataFrame plan on the fixtures. */
class BqlSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  private def events = Tables.load(spark, sfDir, "events")

  // ---- parser structure ----

  test("parses the full clause set") {
    val q = Parser.parse(
      "SELECT event_type, COUNT(*) AS cnt FROM STREAM WHERE value > 10 AND event_type != 'x' " +
        "GROUP BY event_type HAVING cnt > 2 ORDER BY cnt DESC, event_type " +
        "WINDOWING EVERY(5000, TIME, ALL) LIMIT 7 DURATION 60000")
    assert(q.where.isDefined)
    assert(q.agg.isInstanceOf[Ast.GroupAgg])
    assert(q.having.isDefined)
    assert(q.orderBy.size == 2 && q.orderBy.head.desc)
    assert(q.window.contains(Ast.WindowSpec(5000, Ast.TimeUnit, includeAll = true)))
    assert(q.limit.contains(7))
    assert(q.durationMs.contains(60000L))
  }

  test("operator precedence: OR binds looser than AND, arithmetic under comparison") {
    val q = Parser.parse("SELECT * FROM STREAM WHERE a == 1 AND b == 2 OR c == 3")
    val Ast.Binary("OR", l, _) = q.where.get: @unchecked
    assert(l.isInstanceOf[Ast.Binary] && l.asInstanceOf[Ast.Binary].op == "AND")
    val q2 = Parser.parse("SELECT * FROM STREAM WHERE a + 1 * 2 > 3")
    val Ast.Binary(">", Ast.Binary("+", _, mul), _) = q2.where.get: @unchecked
    assert(mul == Ast.Binary("*", Ast.Lit(1L), Ast.Lit(2L)))
  }

  test("aggregate forms parse to the right Agg") {
    assert(Parser.parse("SELECT COUNT(DISTINCT a, b) AS n FROM STREAM").agg ==
      Ast.CountDistinctAgg(Seq("a", "b"), "n"))
    assert(Parser.parse("SELECT TOP(5, a) AS c FROM STREAM").agg ==
      Ast.TopKAgg(5, Seq("a"), "c"))
    assert(Parser.parse("SELECT QUANTILE(v, 0.25, 0.5) AS q FROM STREAM").agg ==
      Ast.QuantileAgg("v", Seq(0.25, 0.5), "q"))
    assert(Parser.parse("SELECT * FROM STREAM").agg == Ast.RawAll)
  }

  test("DISTRIBUTION generated point specs: LINEAR and REGION") {
    // QUANTILE LINEAR n -> n evenly spaced probabilities incl. both ends
    assert(Parser.parse("SELECT QUANTILE(v, LINEAR, 5) AS q FROM STREAM").agg ==
      Ast.QuantileAgg("v", Seq(0.0, 0.25, 0.5, 0.75, 1.0), "q"))
    // QUANTILE REGION over the probability domain
    assert(Parser.parse("SELECT QUANTILE(v, REGION, 0.2, 0.8, 0.3) AS q FROM STREAM").agg ==
      Ast.QuantileAgg("v", Seq(0.2, 0.5, 0.8), "q"))
    // PMF/CDF REGION -> static value-domain split points
    assert(Parser.parse("SELECT PMF(v, REGION, 20, 80, 20) AS n FROM STREAM").agg ==
      Ast.PmfAgg("v", Seq(20.0, 40.0, 60.0, 80.0), cdf = false, "n"))
    // PMF/CDF LINEAR -> dynamic data-domain points, count carried through
    assert(Parser.parse("SELECT CDF(v, LINEAR, 11) AS n FROM STREAM").agg ==
      Ast.PmfAgg("v", Nil, cdf = true, "n", linearN = Some(11)))
    // malformed generator forms fail as parse errors
    val badSpecs = Seq(
      "SELECT QUANTILE(v, LINEAR, 1) AS q FROM STREAM", // < 2 points
      "SELECT QUANTILE(v, LINEAR) AS q FROM STREAM", // missing count
      "SELECT PMF(v, REGION, 80, 20, 10) AS n FROM STREAM", // end < start
      "SELECT PMF(v, REGION, 20, 80, 0) AS n FROM STREAM", // zero step
      "SELECT PMF(v, REGION, 20, 80) AS n FROM STREAM", // missing step
      "SELECT QUANTILE(v, REGION, 0.5, 1.5, 0.25) AS q FROM STREAM", // prob > 1
      "SELECT CDF(v, LINEAR, x) AS n FROM STREAM") // non-numeric count
    badSpecs.foreach(b => assertThrows[BqlParseException](Parser.parse(b)))
    // MANUAL is bullet-core's explicit-list keyword: identical AST to
    // the bare list, for drop-in BQL compatibility
    assert(Parser.parse("SELECT QUANTILE(v, MANUAL, 0.1, 0.5, 0.9) AS q FROM STREAM").agg ==
      Parser.parse("SELECT QUANTILE(v, 0.1, 0.5, 0.9) AS q FROM STREAM").agg)
    assert(Parser.parse("SELECT PMF(v, MANUAL, 20, 80) AS n FROM STREAM").agg ==
      Parser.parse("SELECT PMF(v, 20, 80) AS n FROM STREAM").agg)
    assertThrows[BqlParseException](
      Parser.parse("SELECT QUANTILE(v, MANUAL) AS q FROM STREAM")) // empty list
  }

  test("malformed input throws BqlParseException, never anything else") {
    val bad = Seq(
      "SELEKT * FROM STREAM", "SELECT * FROM TABLE", "SELECT FROM STREAM",
      "SELECT * FROM STREAM WHERE", "SELECT * FROM STREAM LIMIT x",
      "SELECT COUNT(DISTINCT a) AS n FROM STREAM GROUP BY b",
      "SELECT * FROM STREAM WINDOWING SLIDING(5, TIME)",
      "SELECT * FROM STREAM trailing garbage ,,")
    bad.foreach { b =>
      assertThrows[BqlParseException](Parser.parse(b))
    }
  }

  test("fuzz: random garbage only ever raises BqlParseException") {
    val rnd = new scala.util.Random(13)
    val frags = Array("SELECT", "FROM", "STREAM", "WHERE", "GROUP", "BY", "(", ")",
      ",", "*", "+", "==", "AND", "'x", "x'", "COUNT", "TOP", "WINDOWING",
      "EVERY", "LIMIT", "DURATION", "1", "1.5", "field", "AS", "\u0000", "%%",
      "SET", ";", "=", "spark.graft.k")
    (1 to 300).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(12))(frags(rnd.nextInt(frags.length))).mkString(" ")
      try { Parser.parse(s); () }
      catch {
        case _: BqlParseException => ()
        case e: Throwable => fail(s"input '$s' threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("SET statements parse: spark.graft.* only, query-local knob precedence") {
    val q = Parser.parse(
      "SET spark.graft.bql.theta.lgk = 17; SET spark.graft.approxDistinct = 'true' " +
        "SELECT COUNT(DISTINCT event_id) AS n FROM STREAM")
    assert(q.settings == Seq(
      "spark.graft.bql.theta.lgk" -> "17",
      "spark.graft.approxDistinct" -> "true"))
    // the text surface must not be able to mutate arbitrary engine conf:
    // non-graft keys AND privileged graft keys (paths, caps, guards) are
    // rejected — only the Ast.SettableKeys accuracy levers parse
    val bad = Seq(
      "SET spark.sql.shuffle.partitions = 1; SELECT * FROM STREAM",
      "SET spark.graft.index.dir = '/tmp/evil'; SELECT * FROM STREAM",
      "SET spark.graft.allowQuadratic = true; SELECT * FROM STREAM",
      "SET spark.graft.bql.theta.lgk SELECT * FROM STREAM", // missing =
      "SET spark.graft.bql.theta.lgk = SELECT * FROM STREAM", // missing value
      "SET spark.graft.bql.theta.lgk = ; SELECT * FROM STREAM",
      // an operator token where a value belongs is a parse error, never
      // a conf write ("," would otherwise become the stored value)
      "SET spark.graft.approxTopK = , SELECT * FROM STREAM",
      "SET spark.graft.approxTopK = * SELECT * FROM STREAM",
      "SET = 17 SELECT * FROM STREAM")
    bad.foreach(b => assertThrows[BqlParseException](Parser.parse(b)))
    // knob resolution: per-query SET > session conf > default, range-checked
    assert(Compiler.intSetting(q, _ => Some("16"), Compiler.ThetaLgkKey, 12, 4, 26) == 17)
    val noSet = Parser.parse("SELECT COUNT(DISTINCT a) AS n FROM STREAM")
    assert(Compiler.intSetting(noSet, _ => Some("16"), Compiler.ThetaLgkKey, 12, 4, 26) == 16)
    assert(Compiler.intSetting(noSet, _ => None, Compiler.ThetaLgkKey, 12, 4, 26) == 12)
    // out-of-range / non-integer knob values are query errors (B16 channel)
    intercept[BqlParseException](
      Compiler.compile("SET spark.graft.bql.theta.lgk = 99; " +
        "SELECT COUNT(DISTINCT event_id) AS n FROM STREAM")._2(events))
    intercept[BqlParseException](
      Compiler.compile("SET spark.graft.bql.kll.k = abc; " +
        "SELECT QUANTILE(value, 0.5) AS q FROM STREAM")._2(events))
  }

  test("SET semantics: knobs reach the sketch; other keys stick in session conf") {
    // lgk=4 → 16 nominal entries, above the 3 distinct event types: the
    // tiny sketch still answers exactly, proving the knob reached the
    // builder (the default 4096-entry sketch would too — the point is the
    // query RUNS with the overridden size and stays correct below it)
    val df = events.limit(200)
    val n = Compiler.compile("SET spark.graft.bql.theta.lgk = 4; " +
      "SELECT COUNT(DISTINCT event_type) AS n FROM STREAM")._2(df).head().getLong(0)
    assert(n == df.select("event_type").distinct().count())
    // non-knob allowlisted keys behave like Spark SQL SET: sticky in the
    // session conf (approxPercentile.k is inert unless the percentile
    // mode is armed, so the brief sticky window cannot affect others)
    val key = "spark.graft.approxPercentile.k"
    Compiler.compile(s"SET $key = 200 SELECT event_id FROM STREAM LIMIT 1")._2(df).collect()
    assert(spark.conf.get(key) == "200")
    spark.conf.unset(key)
    // a bad bql.* value in SESSION conf must not fail an unrelated
    // query that uses no sketch (knobs resolve lazily per aggregate)
    spark.conf.set(Compiler.KllKKey, "not-a-number")
    try {
      assert(Compiler.compile("SELECT event_id FROM STREAM LIMIT 1")._2(df).count() == 1)
      intercept[BqlParseException](
        Compiler.compile("SELECT QUANTILE(value, 0.5) AS q FROM STREAM")._2(df))
    } finally spark.conf.unset(Compiler.KllKKey)
  }

  test("string literals with escaped quotes and IS NULL / BETWEEN / IN / LIKE") {
    val q = Parser.parse(
      "SELECT * FROM STREAM WHERE a == 'it\\'s' AND b IS NOT NULL AND c BETWEEN 1 AND 5 " +
        "AND d IN ('x', 'y') AND e LIKE '%z%'")
    assert(q.where.isDefined)
  }

  // ---- compiled semantics vs hand-written plans ----

  private def sameResult(bql: String, expected: org.apache.spark.sql.DataFrame): Unit = {
    val got = Compiler.compile(bql)._2(events)
    assert(got.collect().toSeq == expected.collect().toSeq, bql)
  }

  test("compiled filter equals hand-written filter") {
    sameResult(
      "SELECT event_id FROM STREAM WHERE value >= 100 AND NOT (event_type == 'click') ORDER BY event_id",
      events.filter(col("value") >= 100 && !(col("event_type") === "click"))
        .select(col("event_id")).orderBy(col("event_id")))
  }

  test("compiled scalar functions equal hand-written ones") {
    sameResult(
      "SELECT UPPER(event_type) AS u, ABS(value - 250) AS a FROM STREAM WHERE event_id < 50 ORDER BY event_id",
      events.filter(col("event_id") < 50)
        .select(upper(col("event_type")).as("u"), abs(col("value") - 250).as("a")))
  }

  test("compiled IF/CAST/arithmetic equal hand-written") {
    sameResult(
      "SELECT IF(value > 250, 'hi', 'lo') AS band, CAST(value, LONG) AS v FROM STREAM WHERE event_id < 50 ORDER BY event_id",
      events.filter(col("event_id") < 50)
        .select(when(col("value") > 250, "hi").otherwise("lo").as("band"),
          col("value").cast("long").as("v")))
  }

  test("map/list/json ops: CONTAINSKEY, CONTAINSVALUE, SIZEIS, JSON") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("m", org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.types.StructField("arr", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.types.StructField("js", org.apache.spark.sql.types.StringType)))
    val rows = Seq(
      org.apache.spark.sql.Row(1L, Map("a" -> 1L, "b" -> 2L), Seq("x", "y"), """{"k": 7}"""),
      org.apache.spark.sql.Row(2L, Map("c" -> 3L), Seq("x"), """{"k": 9}"""))
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = Compiler.compile(
      "SELECT id, CONTAINSKEY(m, 'a') AS ck, CONTAINSVALUE(m, 3) AS cv, " +
        "SIZEIS(arr, 2) AS s2, CAST(JSON(js, '$.k'), LONG) AS k FROM STREAM ORDER BY id")._2(df)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getLong(4))).toSeq
    assert(got == Seq((1L, true, false, true, 7L), (2L, false, true, false, 9L)))
  }

  test("LATERAL VIEW EXPLODE: alias visible to WHERE, GROUP BY, and select") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("arr", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))))
    val rows = Seq(
      org.apache.spark.sql.Row(1L, Seq("a", "b", "skip")),
      org.apache.spark.sql.Row(2L, Seq("a")),
      org.apache.spark.sql.Row(3L, Seq.empty[String]))
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = Compiler.compile(
      "SELECT x, COUNT(*) AS cnt FROM STREAM LATERAL VIEW EXPLODE(arr) AS x " +
        "WHERE x != 'skip' GROUP BY x ORDER BY x")._2(df)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 1L)))
    // plain explode drops the empty-array row; OUTER keeps it with null
    val inner = Compiler.compile(
      "SELECT id, x FROM STREAM LATERAL VIEW EXPLODE(arr) AS x ORDER BY id, x")._2(df)
    assert(inner.count() == 4)
    val outer = Compiler.compile(
      "SELECT id, x FROM STREAM LATERAL VIEW OUTER EXPLODE(arr) AS x ORDER BY id, x")._2(df)
    assert(outer.count() == 5)
    assert(outer.filter("id = 3").collect().head.isNullAt(1))
  }

  test("LATERAL VIEW EXPLODE of a map yields (key, value) rows") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("m", org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType))))
    val rows = Seq(org.apache.spark.sql.Row(1L, Map("a" -> 1L, "b" -> 2L)))
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = Compiler.compile(
      "SELECT id, k, v FROM STREAM LATERAL VIEW EXPLODE(m) AS k, v " +
        "WHERE v > 0 ORDER BY k")._2(df)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a", 1L), (1L, "b", 2L)))
    // missing AS is a parse error on the error channel, not a crash
    intercept[BqlParseException](
      Parser.parse("SELECT x FROM STREAM LATERAL VIEW EXPLODE(arr) x"))
    // a dotted alias would compile to an unresolvable field path — parse error
    intercept[BqlParseException](
      Parser.parse("SELECT x FROM STREAM LATERAL VIEW EXPLODE(arr) AS a.b"))
    // an alias shadowing an existing field is rejected with a clear
    // message at plan time (schema unknown at parse time)
    val err = intercept[BqlParseException](
      Compiler.compile("SELECT id FROM STREAM LATERAL VIEW EXPLODE(m) AS id, v")._2(df))
    assert(err.getMessage.contains("collides"), err.getMessage)
    // ... and the collision check matches Spark's case-insensitive
    // resolution: 'AS ID' over a stream with column 'id' collides too
    val errCi = intercept[BqlParseException](
      Compiler.compile("SELECT id FROM STREAM LATERAL VIEW EXPLODE(m) AS ID, v")._2(df))
    assert(errCi.getMessage.contains("collides"), errCi.getMessage)
    // a clause keyword where an alias belongs ('AS a, WHERE …') is a
    // targeted parse error at the alias, not a trailing-input error
    val errKw = intercept[BqlParseException](
      Parser.parse("SELECT x FROM STREAM LATERAL VIEW EXPLODE(arr) AS a, WHERE x > 1"))
    assert(errKw.getMessage.contains("bad explode alias"), errKw.getMessage)
  }

  test("fn keywords are plain identifiers when not followed by '('") {
    // QUANTILE's own output column is named 'quantile' — ORDER BY must
    // treat it as a field reference, not an aggregate call
    val q = Parser.parse("SELECT QUANTILE(value, 0.5) AS q FROM STREAM ORDER BY quantile")
    assert(q.agg.isInstanceOf[Ast.QuantileAgg])
    assert(q.orderBy.head.expr == Ast.FieldRef("quantile"))
    val q2 = Parser.parse("SELECT count FROM STREAM WHERE sum > 2")
    assert(q2.select.head.expr == Ast.FieldRef("count"))
    assert(q2.where.contains(Ast.Binary(">", Ast.FieldRef("sum"), Ast.Lit(2L))))
  }

  test("B2 COPY projection: SELECT *, computed keeps originals") {
    val got = Compiler.compile(
      "SELECT *, LENGTH(event_type) AS tlen FROM STREAM WHERE event_id < 10 ORDER BY event_id")._2(events)
    assert(got.columns.toSeq == events.columns.toSeq :+ "tlen")
    val ref = events.filter(col("event_id") < 10)
      .withColumn("tlen", length(col("event_type"))).orderBy(col("event_id"))
    assert(got.collect().toSeq == ref.collect().toSeq)
  }

  test("B10 COMPUTATION: computed columns over aggregate output") {
    val got = Compiler.compile(
      "SELECT event_type, COUNT(*) AS cnt, cnt * 2 AS double_cnt FROM STREAM " +
        "GROUP BY event_type HAVING cnt > 0 ORDER BY event_type")._2(events)
    val ref = events.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .withColumn("double_cnt", col("cnt") * 2)
      .orderBy(col("event_type"))
    assert(got.collect().toSeq == ref.collect().toSeq)
    // culling the intermediate: computation + CULL drops the helper column
    val culled = Compiler.compile(
      "SELECT event_type, COUNT(*) AS cnt, cnt * 2 AS double_cnt FROM STREAM " +
        "GROUP BY event_type ORDER BY event_type CULL cnt")._2(events)
    assert(culled.columns.toSeq == Seq("event_type", "double_cnt"))
  }

  test("B10: two select items aliasing the same GROUP BY key expression") {
    val got = Compiler.compile(
      "SELECT event_id % 10 AS a, event_id % 10 AS b, COUNT(*) AS cnt FROM STREAM " +
        "GROUP BY event_id % 10 ORDER BY a")._2(events)
    assert(got.columns.toSeq.sorted == Seq("a", "b", "cnt"),
      s"got columns ${got.columns.toSeq}")
    val rows = got.select("a", "b", "cnt").collect()
    val ref = events.groupBy((col("event_id") % 10).as("a"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("a"), col("a").as("b"), col("cnt"))
      .orderBy("a").collect()
    assert(rows.toSeq == ref.toSeq)
  }

  test("typed field paths: m['k'], map-of-map, list[i], list[i].k (SURVEY §1.2)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("m", MapType(StringType, LongType)),
      StructField("mm", MapType(StringType, MapType(StringType, StringType))),
      StructField("ml", ArrayType(MapType(StringType, LongType))),
      StructField("arr", ArrayType(StringType))))
    val rows = Seq(org.apache.spark.sql.Row(
      1L, Map("a" -> 5L), Map("x" -> Map("y" -> "deep")),
      Seq(Map("k" -> 7L), Map("k" -> 8L)), Seq("p", "q")))
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = Compiler.compile(
      "SELECT m['a'] AS ma, mm['x']['y'] AS deep, ml[1].k AS mlk, arr[0] AS a0 " +
        "FROM STREAM WHERE m['a'] == 5")._2(df).head()
    assert(got.getLong(0) == 5L)
    assert(got.getString(1) == "deep")
    assert(got.getLong(2) == 8L)
    assert(got.getString(3) == "p")
  }

  test("null semantics: comparisons propagate null, ISNULL/IF recover (B3)") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType)))
    val rows = Seq(
      org.apache.spark.sql.Row(1L, 10.0, "a"),
      org.apache.spark.sql.Row(2L, null, "b"),
      org.apache.spark.sql.Row(3L, 30.0, null))
    val df = spark.createDataFrame(rows.asJava, schema)
    // null comparison is not-true → row 2 dropped by v > 5 (Bullet's
    // NULL/UNKNOWN never matches a filter, same as SQL three-valued logic)
    assert(Compiler.compile("SELECT id FROM STREAM WHERE v > 5")._2(df)
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // NOT(null) is still null → row 2 dropped on both sides of the NOT
    assert(Compiler.compile("SELECT id FROM STREAM WHERE NOT (v > 5)")._2(df)
      .collect().isEmpty)
    // ISNULL selects it; IF recovers a default
    assert(Compiler.compile("SELECT id FROM STREAM WHERE v IS NULL")._2(df)
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    val recovered = Compiler.compile(
      "SELECT id, IF(ISNULL(v), 0.0, v) AS v2 FROM STREAM ORDER BY id")._2(df)
      .collect().map(_.getDouble(1)).toSeq
    assert(recovered == Seq(10.0, 0.0, 30.0))
    // null string in grouping forms its own group (SQL GROUP BY semantics)
    val grouped = Compiler.compile(
      "SELECT s, COUNT(*) AS c FROM STREAM GROUP BY s ORDER BY c DESC, s")._2(df)
    assert(grouped.count() == 3)
  }

  // property: numeric comparison predicates agree with Spark on random thresholds
  test("property: filter thresholds agree with Spark for any threshold") {
    val cached = events.select("event_id", "value").cache()
    val rnd = new scala.util.Random(42)
    try {
      (1 to 20).foreach { _ =>
        val t = -100.0 + rnd.nextDouble() * 700.0
        val bql = Compiler.compile(s"SELECT event_id FROM STREAM WHERE value > $t")._2(cached)
        val ref = cached.filter(col("value") > t).select("event_id")
        assert(bql.count() == ref.count(), s"threshold $t")
      }
    } finally { cached.unpersist(); () }
  }

  test("multi-field COUNT DISTINCT distinguishes positional nulls") {
    // Spark hash expressions skip null children, so a bare
    // xxhash64(struct(a, b)) collapses ('a', NULL) with (NULL, 'a');
    // compositeKey interleaves IS NULL markers to keep them apart.
    import spark.implicits._
    val df = Seq[(String, String)](
      ("a", null), (null, "a"), ("a", null), ("a", "a"), (null, null))
      .toDF("f1", "f2")
    val got = Compiler.compile("SELECT COUNT(DISTINCT f1, f2) AS n FROM STREAM")._2(df)
      .head().getLong(0)
    // distinct non-all-null tuples: (a,NULL), (NULL,a), (a,a) — the
    // all-null tuple is ignored like a single-field NULL
    assert(got == 3L, s"got $got")
  }

  test("pipeline scalar verbs: LANGID/QUALITY/TOKENS compose in WHERE and projections") {
    import spark.implicits._
    val df = Seq(
      (1L, "the fast merge join group the the a"),
      (2L, "data value row data table column"),
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    // LANGID: argmax with first-wins ties; null/empty score like empty → 'en'
    val langs = Compiler.compile(
      "SELECT doc_id, LANGID(text) AS l FROM STREAM ORDER BY doc_id")._2(df)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(langs == Seq((1L, "en"), (2L, "es"), (3L, "en"), (4L, "en")), s"$langs")
    // the kernels are the SHARED vals — the Scala surface agrees by construction
    val direct = df.select(col("doc_id"),
      graft.functions.TextFns.langId(col("text")).as("l"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(direct.sortBy(_._1) == langs)
    // QUALITY in a WHERE: doc 1 has stopwords + enough uniqueness → >= 2 needs
    // the length band too (all fixtures are short) — so quality is 2 at most
    val q = Compiler.compile(
      "SELECT doc_id, QUALITY(text) AS q FROM STREAM WHERE QUALITY(text) >= 2 " +
        "ORDER BY doc_id")._2(df)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(q.forall(_._2 >= 2) && q.nonEmpty, s"$q")
    // TOKENS as a budget predicate; null text counts like empty (1 token)
    val t = Compiler.compile(
      "SELECT doc_id, TOKENS(text) AS n FROM STREAM WHERE TOKENS(text) <= 6 " +
        "ORDER BY doc_id")._2(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(t == Seq((2L, 6L), (3L, 1L), (4L, 1L)), s"$t")
    // bad arity is a parse error on the error channel, not a crash
    intercept[BqlParseException](Compiler.compile(
      "SELECT LANGID(text, lang) FROM STREAM"))
  }

  // property: random boolean combinations of two predicates agree
  test("property: AND/OR/XOR/NOT combinations agree with Spark") {
    val cached = events.select("event_id", "value", "user_id").cache()
    val rnd = new scala.util.Random(7)
    try {
      (1 to 15).foreach { _ =>
        val op = Seq("AND", "OR", "XOR")(rnd.nextInt(3))
        val u = rnd.nextLong(150L)
        val bql = Compiler.compile(
          s"SELECT event_id FROM STREAM WHERE value > 250 $op NOT (user_id < $u)")._2(cached)
        val sparkPred = op match {
          case "AND" => col("value") > 250 && !(col("user_id") < u)
          case "OR" => col("value") > 250 || !(col("user_id") < u)
          case "XOR" => (col("value") > 250) =!= !(col("user_id") < u)
        }
        assert(bql.count() == cached.filter(sparkPred).count(), s"$op $u")
      }
    } finally { cached.unpersist(); () }
  }
}
