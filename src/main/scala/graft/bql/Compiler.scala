package graft.bql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Ast._

/** BQL AST → Catalyst translation.
  *
  * Pure declarative mapping (SURVEY.md §2.B B3 table): every Bullet
  * expression/op maps 1:1 to a `Column` operation, so Catalyst gets the
  * whole tree — predicate pushdown, constant folding and codegen apply to
  * BQL queries exactly as to hand-written DataFrame code. No custom
  * Expression is needed for any B3 op.
  */
object Compiler {

  /** BQL-tunable sketch knobs (the text surface's per-query lever —
    * everything else under spark.graft.* is forwarded to the session conf
    * with Spark SQL `SET` statement semantics: sticky until changed). */
  val ThetaLgkKey = "spark.graft.bql.theta.lgk"
  val KllKKey = "spark.graft.bql.kll.k"

  /** Resolve an integer knob: per-query SET > session conf > default,
    * range-checked (bad values are query errors → the B16 error channel,
    * never a crash inside DataSketches). */
  def intSetting(q: Query, conf: String => Option[String],
      key: String, dflt: Int, lo: Int, hi: Int): Int = {
    val raw = q.settings.collectFirst { case (k, v) if k == key => v }
      .orElse(conf(key))
    raw.map { v =>
      val n = try v.toInt catch {
        case _: NumberFormatException =>
          throw new BqlParseException(s"$key must be an integer, got '$v'")
      }
      if (n < lo || n > hi)
        throw new BqlParseException(s"$key must be in [$lo, $hi], got $n")
      n
    }.getOrElse(dflt)
  }

  def column(e: Expr): Column = e match {
    // SAMPLE(frac, content): deterministic content-keyed sampling — keep
    // a row iff the first md5 byte of the content falls in the lowest
    // round(frac·256) values. Hash-keyed → stable under repartitioning
    // and re-runs (samp_hash_sample's discipline); frac must be a
    // literal because the cut point is baked into the plan.
    case Binary("SAMPLE", content, fracExpr) =>
      val f = fracExpr match {
        case Lit(d: Double) => d
        case Lit(l: Long) => l.toDouble
        case other =>
          throw new BqlParseException(s"SAMPLE fraction must be a literal, got $other")
      }
      if (f <= 0 || f > 1)
        throw new BqlParseException(s"SAMPLE fraction must be in (0, 1], got $f")
      val cut = math.round(f * 256).toInt
      if (cut >= 256) lit(true)
      else substring(md5(column(content)), 1, 2) < lit(f"$cut%02x")
    // dotted paths resolve type-aware (struct field OR map key — Bullet's
    // `a.b` reads map subfields; UnresolvedExtractValue handles both)
    case FieldRef(p) if p.contains('.') =>
      val parts = p.split('.')
      parts.tail.foldLeft(col(parts.head))((c, seg) => c.getItem(seg))
    case FieldRef(p) => col(p)
    case Lit(null) => lit(null)
    case Lit(v) => lit(v)
    case ListLit(items) => array(items.map(column): _*)
    case If(c, t, f) => when(column(c), column(t)).otherwise(column(f))
    case Quantified(op, l, all, list) =>
      val lc = column(l)
      val cmp: Column => Column = x => op match {
        case "==" => lc === x
        case "!=" => lc =!= x
        case ">" => lc > x
        case ">=" => lc >= x
        case "<" => lc < x
        case "<=" => lc <= x
        case other => throw new BqlParseException(s"bad quantified op $other")
      }
      list match {
        // literal list: expand to an OR/AND chain — plain comparisons
        // push down to the scan (PushedFilters), which a higher-order
        // exists() over an array literal never does
        case ListLit(items) =>
          val legs = items.map(i => cmp(column(i)))
          if (all) legs.reduce(_ && _) else legs.reduce(_ || _)
        // list-valued expression (field of list): codegen'd exists/forall
        // with the left side as an outer reference
        case _ =>
          if (all) forall(column(list), cmp) else exists(column(list), cmp)
      }
    case Between(e1, lo, hi) => column(e1).between(column(lo), column(hi))
    case Cast(e1, to) =>
      val dt = to match {
        case "INTEGER" | "INT" => IntegerType
        case "LONG" | "BIGINT" => LongType
        case "FLOAT" => FloatType
        case "DOUBLE" => DoubleType
        case "STRING" => StringType
        case "BOOLEAN" => BooleanType
        case other => throw new BqlParseException(s"bad cast target $other")
      }
      column(e1).cast(dt)
    case Unary(op, e1) =>
      val c = column(e1)
      op match {
        case "NOT" => !c
        case "-" => -c
        case "ABS" => abs(c)
        case "LOWER" => lower(c)
        case "UPPER" => upper(c)
        case "TRIM" => trim(c)
        case "SIZEOF" => size(c)
        case "LENGTH" => length(c) // Bullet's SIZEOF also covers strings; Spark splits them
        case "ISNULL" => c.isNull
        case "ISNOTNULL" => c.isNotNull
        // the LLM-pipeline scalar verbs — shared kernels with the Scala
        // query surface (graft.functions.TextFns), null-safe
        case "LANGID" => graft.functions.TextFns.langId(c)
        case "QUALITY" => graft.functions.TextFns.quality(c)
        case "TOKENS" => graft.functions.TextFns.tokenCount(c)
        case other => throw new BqlParseException(s"bad unary op $other")
      }
    case Binary(op, l, r) =>
      val (cl, cr) = (column(l), column(r))
      op match {
        case "+" => cl + cr
        case "-" => cl - cr
        case "*" => cl * cr
        case "/" => cl / cr
        case "%" => cl % cr
        case "==" => cl === cr
        case "!=" => cl =!= cr
        case ">" => cl > cr
        case ">=" => cl >= cr
        case "<" => cl < cr
        case "<=" => cl <= cr
        case "AND" => cl && cr
        case "OR" => cl || cr
        case "XOR" => cl =!= cr
        case "LIKE" => cl.like(r.asInstanceOf[Lit].value.toString)
        case "RLIKE" => cl.rlike(r.asInstanceOf[Lit].value.toString)
        case "IN" => cl.isin(r.asInstanceOf[ListLit].items.map(_.asInstanceOf[Lit].value): _*)
        // element access m['k'] / list[0] / x.k — type-aware at analysis.
        // getItem on an int literal is 0-based for arrays (Bullet list[i]).
        case "[]" => r match {
          case Lit(v) => cl.getItem(v)
          case _ => cl.getItem(cr)
        }
        // B3 map/list ops: CONTAINSKEY/CONTAINSVALUE work on maps AND on
        // lists-of-maps like bullet-core's (value op checks lists too)
        case "CONTAINSKEY" => map_contains_key(cl, cr)
        case "CONTAINSVALUE" => array_contains(map_values(cl), cr)
        case "SIZEIS" => size(cl) === cr
        // dynamic-schema tail: JSON(col, '$.path') over a JSON string
        // column — our analog of BulletRecord's runtime-typed map fields
        case "JSON" => get_json_object(cl, r.asInstanceOf[Lit].value.toString)
        // B3 FILTER(list, mask): keep elements whose positional boolean
        // is true (bullet-core's elementwise mask selection). Tagging
        // survivors before the compact keeps legitimate null elements.
        case "FILTER" =>
          transform(
            filter(
              zip_with(cl, cr, (x, keep) => struct(x.as("v"), keep.as("k"))),
              p => coalesce(p.getField("k"), lit(false))),
            p => p.getField("v"))
        case other => throw new BqlParseException(s"bad binary op $other")
      }
    case other => throw new BqlParseException(s"unsupported expression $other")
  }

  private def aggColumn(op: AggOp): Column = {
    val c = op.arg.map(column)
    val a = op.fn match {
      case "COUNT" => c.map(count).getOrElse(count(lit(1)))
      case "SUM" => sum(c.get)
      case "MIN" => min(c.get)
      case "MAX" => max(c.get)
      case "AVG" => avg(c.get)
      case other => throw new BqlParseException(s"bad aggregate $other")
    }
    a.as(op.name)
  }

  private def selectItemCol(s: SelectItem, i: Int): Column = {
    val c = column(s.expr)
    s.alias.orElse(s.expr match {
      case FieldRef(p) => Some(p)
      case _ => None
    }).map(c.as).getOrElse(c.as(s"expr_$i"))
  }

  /** The LATERAL VIEW EXPLODE stage as a standalone transform — applied
    * before WHERE by [[batchPlan]], and by the streaming engine's solo
    * path (a lateral query changes row cardinality, so it can never join
    * a fused shared-scan job; the engine forces it solo). An alias that
    * shadows an existing stream field is rejected here with a clear
    * message (the schema is unknown at parse time, so this is the
    * earliest possible check; the engine surfaces it as a FAIL clip)
    * rather than letting Spark throw an ambiguous-reference error. */
  def lateralStage(lv: LateralView): DataFrame => DataFrame = { df =>
    // case-insensitive: Spark resolves identifiers case-insensitively by
    // default (spark.sql.caseSensitive=false), so 'AS ID' over a stream
    // with column 'id' would pass a case-sensitive guard and then hit the
    // ambiguous-reference error this check exists to prevent
    lv.aliases.find(a => df.columns.exists(_.equalsIgnoreCase(a))).foreach(a =>
      throw new BqlParseException(s"explode alias '$a' collides with an existing field"))
    val g = if (lv.outer) explode_outer(column(lv.expr)) else explode(column(lv.expr))
    if (lv.aliases.size == 2) df.select(col("*"), g.as(lv.aliases))
    else df.select(col("*"), g.as(lv.aliases.head))
  }

  /** Compile to a batch plan `DataFrame => DataFrame` — the same plan runs
    * the DuckDB-checked batch path and each micro-batch of the streaming
    * engine (partials; the window/duration semantics live in the runtime). */
  def batchPlan(q: Query): DataFrame => DataFrame = { df0 =>
    // SET statements: the two BQL sketch knobs stay query-local; every
    // other spark.graft.* key is a session statement (sticky, like Spark
    // SQL SET) — applied at plan-build so the armed optimizer rules
    // (spark.graft.approxDistinct/approxPercentile/topkFrequent/...) see
    // it when the action optimizes this plan.
    q.settings.foreach { case (k, v) =>
      if (k != ThetaLgkKey && k != KllKKey) df0.sparkSession.conf.set(k, v)
    }
    val sessionConf = (k: String) => df0.sparkSession.conf.getOption(k)
    // Theta lgk 4..26 and KLL k 8..65535 are the DataSketches-documented
    // legal ranges for the underlying builders. LAZY: only a query whose
    // aggregate actually uses a knob validates it — a bad bql.* value in
    // session conf must not fail an unrelated RAW/filter query.
    lazy val thetaLgk = intSetting(q, sessionConf, ThetaLgkKey, 12, 4, 26)
    lazy val kllK = intSetting(q, sessionConf, KllKKey, 65535, 8, 65535)
    var df = df0
    q.lateral.foreach(lv => df = lateralStage(lv)(df))
    q.where.foreach(w => df = df.filter(column(w)))
    df = q.agg match {
      case RawAll => rawProjection(q, df)
      case GroupAgg(keys, ops) =>
        val keyCols = keys.zipWithIndex.map { case (s, i) => selectItemCol(s, i) }
        val aggCols = ops.map(aggColumn)
        if (keyCols.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
        else df.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
      case CountDistinctAgg(fields, name) =>
        // Theta-sketch estimate — mergeable partial state (B6)
        df.agg(expr(s"theta_sketch_estimate(theta_sketch_agg(${compositeKey(fields)}, $thetaLgk))").as(name))
      case TopKAgg(k, fields, countName) =>
        df.groupBy(fields.map(col): _*)
          .agg(count(lit(1)).as(countName))
          .orderBy(col(countName).desc +: fields.map(col): _*)
          .limit(k)
      case DedupeAgg(content, idField) =>
        // exact content-hash dedup manifest (dd_exact as query text):
        // one hash-groupBy — partial aggregation map-side, the exchange
        // carries (16-byte hash, min-id, count) rows only
        df.groupBy(md5(column(content)).as("h"))
          .agg(min(col(idField)).as("keep_id"), count(lit(1)).as("n_copies"))
      case SearchAgg(terms, k) =>
        // Okapi BM25 top-k (srch_bm25 as query text) through the shared
        // ranking tree — one corpus scan for stats, one for tf, a
        // broadcast of the 1-row stats frame, bounded top-k
        graft.queries.SearchQueries.bm25Search(df, terms, k)
      case QuantileAgg(field, probs, name) =>
        val ps = if (probs.nonEmpty) probs else Seq(0.25, 0.5, 0.75)
        df.agg(expr(s"kll_sketch_get_quantile_double(kll_sketch_agg_double($field, $kllK)," +
            s" array(${ps.mkString(",")}))").as("__qv"))
          .select(posexplode(col("__qv")).as(Seq("__i", name)))
          .select(element_at(lit(ps.toArray), col("__i") + 1).as("quantile"), col(name))
      case PmfAgg(field, points, isCdf, name, Some(n)) =>
        // LINEAR(n) for PMF/CDF: bullet-core generates n points evenly
        // spaced between the DATA min and max. Two aggregates: a 1-row
        // (min, max) stats frame broadcast-crossJoined onto the scan, then
        // the same conditional-count binning with point EXPRESSIONS; the
        // point values are reconstructed from the carried min/max after
        // the aggregate. The second scan is what the domain costs a batch
        // engine (the streaming path reads min/max off the KLL sketch).
        val v = col(field)
        val stats = df.agg(min(v).as("__lo"), max(v).as("__hi"))
        val pt = (i: Int) =>
          col("__lo") + (col("__hi") - col("__lo")) * lit(i.toDouble / (n - 1))
        val joined = df.crossJoin(broadcast(stats))
        val aggs: Seq[Column] =
          if (isCdf) (0 until n).map(i => count(when(v <= pt(i), 1)))
          else {
            val lowest = count(when(v < pt(0), 1))
            val mids = (1 until n).map(i => count(when(v >= pt(i - 1) && v < pt(i), 1)))
            val highest = count(when(v >= pt(n - 1), 1))
            lowest +: mids :+ highest
          }
        val binned = joined
          .agg(array(aggs: _*).as("__bins"),
            first(col("__lo")).as("__lo"), first(col("__hi")).as("__hi"))
          .select(col("__lo"), col("__hi"), posexplode(col("__bins")).as(Seq("bin", name)))
        if (isCdf)
          binned.select(
            (col("__lo") + (col("__hi") - col("__lo")) *
              (col("bin").cast("double") / (n - 1))).as("point"), col(name))
        else binned.select(col("bin"), col(name))
      case PmfAgg(field, points, isCdf, name, None) =>
        // batch path is exact: conditional counts per interval
        // (bin 0 = (-inf, p0), bin i = [p_{i-1}, p_i), last = [p_n, inf));
        // CDF = count(v <= p_i). The streaming path estimates the same
        // shape from the KLL sketch (KllState.present).
        val v = col(field)
        val aggs: Seq[Column] =
          if (isCdf) points.map(p => count(when(v <= p, 1)))
          else {
            val lowest = count(when(v < points.head, 1))
            val mids = points.sliding(2).collect { case Seq(lo, hi) =>
              count(when(v >= lo && v < hi, 1))
            }.toSeq
            val highest = count(when(v >= points.last, 1))
            lowest +: mids :+ highest
          }
        val binned = df.agg(array(aggs: _*).as("__bins"))
          .select(posexplode(col("__bins")).as(Seq("bin", name)))
        if (isCdf)
          binned.select(element_at(lit(points.toArray), col("bin") + 1).as("point"), col(name))
        else binned
    }
    postAgg(q, df)
  }

  /** Post-aggregation chain (B9–B12): COMPUTATION → HAVING → ORDER BY →
    * CULLING → LIMIT. Shared by the batch plan and the streaming state's
    * present() so the two paths cannot drift. */
  def postAgg(q: Query, df0: DataFrame): DataFrame = {
    var df = df0
    // B10 COMPUTATION: non-aggregate select items over aggregate output
    // (e.g. `cnt * 2 AS double_cnt` after COUNT(*) AS cnt). Plain field
    // references to existing columns are already present — skip them. A
    // select item whose expression IS one of the GROUP BY keys renames
    // that key's output column (`SELECT user_id % 10 AS k … GROUP BY
    // user_id % 10`): the pre-agg input columns no longer exist here, so
    // recomputing the expression would fail to resolve.
    if (q.agg != RawAll) {
      val keyOutputs: Map[Expr, String] = q.agg match {
        case GroupAgg(keys, _) => keys.zipWithIndex.map { case (k, i) =>
          k.expr -> k.alias.orElse(k.expr match {
            case FieldRef(p) => Some(p)
            case _ => None
          }).getOrElse(s"expr_$i")
        }.toMap
        case _ => Map.empty
      }
      // Copy (not rename) the key's output column so a second select item
      // aliasing the SAME key expression still finds it; key columns whose
      // name no select item keeps are dropped afterwards. withColumn
      // replaces in place on a name collision, so no duplicate columns.
      val consumedKeys = scala.collection.mutable.Set.empty[String]
      q.select.zipWithIndex.foreach { case (s, i) =>
        s.expr match {
          case FieldRef(p) if s.alias.isEmpty && df.columns.contains(p) => ()
          case _ =>
            val name = s.alias.getOrElse(s.expr match {
              case FieldRef(p) => p
              case _ => s"expr_$i"
            })
            if (!df.columns.contains(name)) keyOutputs.get(s.expr) match {
              case Some(keyCol) if df.columns.contains(keyCol) =>
                df = df.withColumn(name, df(keyCol))
                if (keyCol != name) consumedKeys += keyCol
              case _ => df = df.withColumn(name, column(s.expr))
            }
        }
      }
      val keptNames = q.select.zipWithIndex.map { case (s, i) =>
        s.alias.getOrElse(s.expr match {
          case FieldRef(p) => p
          case _ => s"expr_$i"
        })
      }.toSet
      consumedKeys.filterNot(keptNames).foreach(k => df = df.drop(k))
    }
    q.having.foreach(h => df = df.filter(column(h)))
    if (q.orderBy.nonEmpty)
      df = df.orderBy(q.orderBy.map(o =>
        if (o.desc) column(o.expr).desc else column(o.expr).asc): _*)
    if (q.culling.nonEmpty) df = df.drop(q.culling: _*)
    q.limit.foreach(n => df = df.limit(n))
    df
  }

  /** RAW projection incl. the reference's three Projection modes (B2):
    * PASSTHROUGH (`SELECT *`), NO_COPY (explicit list), COPY
    * (`SELECT *, computed`). Shared by the batch plan and RawState. */
  def rawProjection(q: Query, df: DataFrame): DataFrame =
    df.select(rawProjectionCols(q, df): _*)

  /** The projection as named Columns over `df` — so the engine's fused
    * RAW pass can evaluate many queries' projections as sibling struct
    * columns inside ONE job instead of one DataFrame per query. COPY mode
    * keeps `withColumn` semantics: same-named computed items replace the
    * base column in place, new names append. */
  def rawProjectionCols(q: Query, df: DataFrame): Seq[Column] =
    if (q.select.isEmpty) df.columns.toSeq.map(col)
    else if (q.copyAll) {
      val items = q.select.zipWithIndex.map { case (s, i) =>
        val name = s.alias.getOrElse(s.expr match {
          case FieldRef(p) => p
          case _ => s"expr_$i"
        })
        name -> column(s.expr)
      }
      val byName = items.toMap
      val base = df.columns.toSeq
      base.map(n => byName.get(n).map(_.as(n)).getOrElse(col(n))) ++
        items.collect { case (n, c) if !base.contains(n) => c.as(n) }
    } else q.select.zipWithIndex.map { case (s, i) => selectItemCol(s, i) }

  /** Distinct key for multi-field COUNT DISTINCT. Hashing the field tuple
    * as a struct alone is NOT null-safe: Spark's hash expressions skip
    * null children entirely (seed passthrough), so
    * `xxhash64(struct('a', NULL)) == xxhash64(struct(NULL, 'a'))` — the
    * positional collapse `concat_ws` has. Interleaving an `IS NULL`
    * marker after each field perturbs the running hash at that position
    * even when the value itself is skipped, so `('a', NULL)` hashes as
    * [a, false, true] and `(NULL, 'a')` as [true, a, false] — distinct
    * mix sequences. All-null tuples map to SQL NULL so the sketch ignores
    * them, matching single-field null semantics. */
  def compositeKey(fields: Seq[String]): String =
    if (fields.size == 1) fields.head
    else {
      val anyNonNull = fields.map(f => s"$f IS NOT NULL").mkString(" OR ")
      val marked = fields.map(f => s"$f, $f IS NULL").mkString(", ")
      s"CASE WHEN $anyNonNull THEN xxhash64(struct($marked)) ELSE NULL END"
    }

  /** Parse + compile in one step. */
  def compile(bql: String): (Query, DataFrame => DataFrame) = {
    val q = Parser.parse(bql)
    (q, batchPlan(q))
  }
}
