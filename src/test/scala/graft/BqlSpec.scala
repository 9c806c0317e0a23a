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
