package graft.bql

import scala.util.matching.Regex

import Ast._

/** Hand-rolled recursive-descent BQL parser (no parser-combinator
  * dependency — the classpath is frozen). Grammar subset:
  *
  * {{{
  * [SET spark.graft.<key> = <value> [;]]...
  * SELECT <*|items> FROM STREAM
  *   [WHERE expr] [GROUP BY items] [HAVING expr]
  *   [ORDER BY expr [ASC|DESC], ...]
  *   [WINDOWING EVERY(n, TIME|RECORD, ALL|WINDOW) | TUMBLING(n, TIME|RECORD)]
  *   [LIMIT n] [DURATION n] [CULL f, ...]
  * }}}
  *
  * Aggregate select items: COUNT(*), COUNT(DISTINCT f,...), SUM/MIN/MAX/AVG,
  * TOP(k, f,...), QUANTILE(f, p,...). Expression ops per SURVEY.md §2.B B3.
  * Parse errors throw [[BqlParseException]] — the engine turns them into the
  * error channel (B16), never a crash.
  */
final class BqlParseException(msg: String) extends Exception(msg)

object Parser {

  private val TokenRe: Regex =
    """\s*(?:(>=|<=|!=|==|<>|[(),*+\-/%<>=\[\].;])|('(?:[^'\\]|\\.)*')|([A-Za-z_][A-Za-z0-9_.$]*)|(-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+))""".r

  private def tokenize(s: String): Vector[String] = {
    var rest = s.trim
    val out = Vector.newBuilder[String]
    while (rest.nonEmpty) {
      TokenRe.findPrefixMatchOf(rest) match {
        case Some(m) =>
          out += m.group(0).trim
          rest = rest.substring(m.end)
        case None => throw new BqlParseException(s"unrecognized input at: '${rest.take(20)}'")
      }
      rest = rest.dropWhile(_.isWhitespace)
    }
    out.result()
  }

  def parse(bql: String): Query =
    try new P(tokenize(bql)).query()
    catch {
      case e: BqlParseException => throw e
      case e: NumberFormatException => throw new BqlParseException(s"bad number: ${e.getMessage}")
      case e: Exception => throw new BqlParseException(s"parse error: ${e.getMessage}")
    }

  private final class P(toks: Vector[String]) {
    private var pos = 0
    private def peek: String = if (pos < toks.length) toks(pos) else ""
    private def peekUp: String = peek.toUpperCase
    private def next(): String = { val t = peek; pos += 1; t }
    private def expect(t: String): Unit = {
      if (peekUp != t.toUpperCase)
        throw new BqlParseException(s"expected $t but found '${peek}'")
      pos += 1
    }
    private def accept(t: String): Boolean =
      if (peekUp == t.toUpperCase) { pos += 1; true } else false

    private val clauseKeywords = Set("WHERE", "GROUP", "BY", "HAVING", "ORDER",
      "WINDOWING", "LIMIT", "DURATION", "CULL", "AS", "FROM", "STREAM", "LATERAL")
    private val aggFns = Set("COUNT", "SUM", "MIN", "MAX", "AVG", "TOP", "QUANTILE", "PMF", "CDF",
      "DEDUPE", "SEARCH")
    private val scalarFns = Set("ABS", "LOWER", "UPPER", "TRIM", "SIZEOF", "LENGTH",
      "ISNULL", "ISNOTNULL", "IF", "CAST", "CONTAINSKEY", "CONTAINSVALUE", "SIZEIS",
      "JSON", "FILTER", "SAMPLE",
      // LLM-pipeline scalar verbs (graft.functions.TextFns kernels) —
      // scalars so they compose inside WHERE and projections alike
      "LANGID", "QUALITY", "TOKENS")

    /** Leading `SET <key> = <value> [;]` statements — the text surface's
      * session/sketch lever (SURVEY §2.B armed modes). Keys are checked
      * against the [[Ast.SettableKeys]] ALLOWLIST: a BQL text must never
      * be able to mutate arbitrary engine conf — store/index paths, caps
      * and guards are the embedding application's privilege, not the
      * query author's. Values are a quoted string, a number, or a bare
      * word (kll/theta/true/...) — an operator token where a value
      * belongs is a parse error, not a conf write. */
    private val SetValueRe = """[A-Za-z_][A-Za-z0-9_.$]*|-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?""".r
    private def setStatements(): Seq[(String, String)] = {
      val b = Vector.newBuilder[(String, String)]
      while (accept("SET")) {
        val key = next()
        if (!Ast.SettableKeys(key))
          throw new BqlParseException(
            s"SET does not accept '$key'; settable keys: " +
              Ast.SettableKeys.toSeq.sorted.mkString(", "))
        expect("=")
        val t = peek
        if (t.isEmpty || t == ";" || t.toUpperCase == "SELECT" || t.toUpperCase == "SET")
          throw new BqlParseException(s"missing value for SET $key")
        val value =
          if (t.startsWith("'")) t.substring(1, t.length - 1).replace("\\'", "'")
          else if (SetValueRe.matches(t)) t
          else throw new BqlParseException(s"bad value '$t' for SET $key")
        next()
        b += key -> value
        accept(";")
      }
      b.result()
    }

    def query(): Query = {
      val settings = setStatements()
      expect("SELECT")
      val star = accept("*")
      // `SELECT *, expr AS x` = Projection COPY mode (B2)
      val copyAll = star && accept(",")
      val items = if (star && !copyAll) Nil else selectList()
      expect("FROM"); expect("STREAM")
      val lateral =
        if (accept("LATERAL")) {
          expect("VIEW")
          val outer = accept("OUTER")
          expect("EXPLODE"); expect("(")
          val e = expr()
          expect(")"); expect("AS")
          // a plain identifier only — the tokenizer's field-path class
          // also admits '.'/'$', which FieldRef would later split and
          // fail to resolve; reject those here as the parse error they are
          def alias(): String = {
            val a = next()
            if (a.isEmpty || !a(0).isLetter ||
                !a.forall(c => c.isLetterOrDigit || c == '_'))
              throw new BqlParseException(s"bad explode alias '$a'")
            // a clause keyword here means the alias list ended early
            // ('EXPLODE(arr) AS a, WHERE …') — reject it HERE, not as a
            // confusing trailing-input error far from the real mistake
            if (clauseKeywords.contains(a.toUpperCase))
              throw new BqlParseException(
                s"bad explode alias '$a' (clause keyword — missing alias before it?)")
            a
          }
          val a1 = alias()
          val aliases = if (accept(",")) Seq(a1, alias()) else Seq(a1)
          Some(LateralView(e, aliases, outer))
        } else None
      val where = if (accept("WHERE")) Some(expr()) else None
      val groupKeys =
        if (accept("GROUP")) { expect("BY"); selectList() } else Nil
      val having = if (accept("HAVING")) Some(expr()) else None
      val order =
        if (accept("ORDER")) {
          expect("BY")
          val b = Vector.newBuilder[OrderItem]
          do {
            val e = expr()
            val desc = if (accept("DESC")) true else { accept("ASC"); false }
            b += OrderItem(e, desc)
          } while (accept(","))
          b.result()
        } else Nil
      val window = if (accept("WINDOWING")) Some(windowSpec()) else None
      val limit = if (accept("LIMIT")) Some(next().toInt) else None
      val duration = if (accept("DURATION")) Some(next().toLong) else None
      val culling =
        if (accept("CULL")) {
          val b = Vector.newBuilder[String]
          do b += next() while (accept(","))
          b.result()
        } else Nil
      if (pos < toks.length)
        throw new BqlParseException(s"trailing input at '${peek}'")

      val aggItems = items.collect { case s @ SelectItem(a: AggCall, _) => (s, a) }
      val agg: Agg =
        if (aggItems.isEmpty && groupKeys.isEmpty) RawAll
        else aggItems match {
          case Seq((SelectItem(_, alias), AggCall("COUNT", _, true, fields, _, _, _)))
              if groupKeys.isEmpty =>
            CountDistinctAgg(fields, alias.getOrElse("count_distinct"))
          case Seq((SelectItem(_, alias), AggCall("TOP", Some(k), _, fields, _, _, _)))
              if groupKeys.isEmpty =>
            TopKAgg(k, fields, alias.getOrElse("count"))
          case Seq((SelectItem(_, _), AggCall("DEDUPE", _, _, Seq(idField), _, Some(content), _)))
              if groupKeys.isEmpty =>
            DedupeAgg(content, idField)
          case Seq((SelectItem(_, _), AggCall("SEARCH", Some(k), _, _, _, Some(Lit(terms: String)), _)))
              if groupKeys.isEmpty =>
            SearchAgg(terms.split("\\s+").toSeq.filter(_.nonEmpty), k)
          case Seq((SelectItem(_, alias), AggCall("QUANTILE", _, _, fields, probs, _, _)))
              if groupKeys.isEmpty =>
            QuantileAgg(fields.head, probs, alias.getOrElse("quantile"))
          case Seq((SelectItem(_, alias), AggCall(k @ ("PMF" | "CDF"), _, _, fields, points, _, linearN)))
              if groupKeys.isEmpty && (points.nonEmpty || linearN.nonEmpty) =>
            PmfAgg(fields.head, points, k == "CDF", alias.getOrElse(k.toLowerCase), linearN)
          case _ =>
            val ops = aggItems.zipWithIndex.map { case ((SelectItem(_, alias), a), i) =>
              if (a.distinct || a.fn == "TOP" || a.fn == "QUANTILE" || a.fn == "PMF" ||
                  a.fn == "CDF" || a.fn == "DEDUPE" || a.fn == "SEARCH")
                throw new BqlParseException(
                  s"${a.fn}${if (a.distinct) " DISTINCT" else ""} cannot mix with GROUP BY / other aggregates")
              AggOp(a.fn, a.arg, alias.getOrElse(s"${a.fn.toLowerCase}_$i"))
            }
            GroupAgg(groupKeys, ops)
        }
      val plainSelect = items.filterNot(_.expr.isInstanceOf[AggCall])
      Query(plainSelect, where, agg, having, order, limit, window, duration, culling, copyAll,
        lateral, settings)
    }

    private def windowSpec(): WindowSpec = {
      val kind = next().toUpperCase
      expect("(")
      val n = next().toLong
      expect(",")
      val unit = next().toUpperCase match {
        case "TIME" => TimeUnit
        case "RECORD" => RecordUnit
        case u => throw new BqlParseException(s"bad window unit $u")
      }
      val includeAll = kind match {
        case "EVERY" =>
          expect(",")
          next().toUpperCase match {
            case "ALL" => true
            case "WINDOW" => false
            case i => throw new BqlParseException(s"bad window include $i")
          }
        case "TUMBLING" => false
        case k => throw new BqlParseException(s"bad window kind $k")
      }
      expect(")")
      WindowSpec(n, unit, includeAll)
    }

    private def selectList(): Seq[SelectItem] = {
      val b = Vector.newBuilder[SelectItem]
      do {
        val e = expr()
        val alias = if (accept("AS")) Some(next()) else None
        b += SelectItem(e, alias)
      } while (accept(","))
      b.result()
    }

    private type AggCall = Ast.AggCall
    private val AggCall = Ast.AggCall

    // precedence: OR < XOR < AND < NOT < cmp/IN/LIKE/BETWEEN < add < mul < unary < primary
    def expr(): Expr = orExpr()

    private def orExpr(): Expr = {
      var l = xorExpr()
      while (accept("OR")) l = Binary("OR", l, xorExpr())
      l
    }
    private def xorExpr(): Expr = {
      var l = andExpr()
      while (accept("XOR")) l = Binary("XOR", l, andExpr())
      l
    }
    private def andExpr(): Expr = {
      var l = notExpr()
      while (accept("AND")) l = Binary("AND", l, notExpr())
      l
    }
    private def notExpr(): Expr =
      if (accept("NOT")) Unary("NOT", notExpr()) else cmpExpr()

    private def cmpExpr(): Expr = {
      val l = addExpr()
      peekUp match {
        case "==" | "=" | "!=" | "<>" | ">" | ">=" | "<" | "<=" =>
          val op = next() match {
            case "=" | "==" => "=="
            case "<>" | "!=" => "!="
            case o => o
          }
          // B3 quantified comparison: `op ANY|ALL (list)` or over a
          // list-typed expression (field of list)
          if (accept("ANY")) Quantified(op, l, all = false, quantifierList())
          else if (accept("ALL")) Quantified(op, l, all = true, quantifierList())
          else Binary(op, l, addExpr())
        case "IN" =>
          next(); Binary("IN", l, listLit())
        case "LIKE" =>
          next(); Binary("LIKE", l, addExpr())
        case "RLIKE" =>
          next(); Binary("RLIKE", l, addExpr())
        case "IS" =>
          next()
          if (accept("NOT")) { expect("NULL"); Unary("ISNOTNULL", l) }
          else { expect("NULL"); Unary("ISNULL", l) }
        case "BETWEEN" =>
          next()
          val lo = addExpr(); expect("AND"); Between(l, lo, addExpr())
        case _ => l
      }
    }

    private def quantifierList(): Expr =
      if (peek == "(") listLit() else addExpr()

    private def listLit(): Expr = {
      expect("(")
      val b = Vector.newBuilder[Expr]
      do b += expr() while (accept(","))
      expect(")")
      ListLit(b.result())
    }

    private def addExpr(): Expr = {
      var l = mulExpr()
      while (peek == "+" || peek == "-") {
        val op = next()
        l = Binary(op, l, mulExpr())
      }
      l
    }
    private def mulExpr(): Expr = {
      var l = unaryExpr()
      while (peek == "*" || peek == "/" || peek == "%") {
        val op = next()
        l = Binary(op, l, unaryExpr())
      }
      l
    }
    private def unaryExpr(): Expr =
      if (peek == "-") { next(); Unary("-", unaryExpr()) } else postfix(primary())

    /** Bullet-style typed element access: `m['k']`, `list[0]`, `list[0].k`
      * (SURVEY §1.2 field paths). Resolved type-aware at analysis via
      * UnresolvedExtractValue — works on maps, arrays and structs alike.
      * Array indices are 0-based like Bullet's `list[i]`. */
    private def postfix(base: Expr): Expr = {
      var e = base
      var more = true
      while (more) {
        if (accept("[")) {
          val idx = expr()
          expect("]")
          e = Binary("[]", e, idx)
        } else if (accept(".")) {
          e = Binary("[]", e, Lit(next()))
        } else more = false
      }
      e
    }

    private def primary(): Expr = {
      val t = peek
      if (t.isEmpty) throw new BqlParseException("unexpected end of input in expression")
      if (t == "(") { next(); val e = expr(); expect(")"); return e }
      if (t.startsWith("'")) {
        next()
        return Lit(t.substring(1, t.length - 1).replace("\\'", "'"))
      }
      if (t.nonEmpty && (t(0).isDigit || (t(0) == '-' && t.length > 1))) {
        next()
        return if (t.contains('.') || t.toLowerCase.contains('e')) Lit(t.toDouble)
        else Lit(t.toLong)
      }
      val up = t.toUpperCase
      if (up == "TRUE") { next(); return Lit(true) }
      if (up == "FALSE") { next(); return Lit(false) }
      if (up == "NULL") { next(); return Lit(null) }
      // fn keywords are only calls when followed by '(' — otherwise they
      // are plain identifiers (e.g. `ORDER BY quantile` over a column the
      // QUANTILE aggregate itself emitted)
      def isCall: Boolean = pos + 1 < toks.length && toks(pos + 1) == "("
      if (aggFns.contains(up) && isCall) return aggCall()
      if (scalarFns.contains(up) && isCall) return scalarCall()
      // plain field path
      next()
      FieldRef(t)
    }

    private def aggCall(): Expr = {
      val fn = next().toUpperCase
      expect("(")
      fn match {
        case "COUNT" =>
          if (accept("*")) { expect(")"); AggCall("COUNT", None, distinct = false, Nil, Nil, None) }
          else if (accept("DISTINCT")) {
            val fs = Vector.newBuilder[String]
            do fs += next() while (accept(","))
            expect(")")
            AggCall("COUNT", None, distinct = true, fs.result(), Nil, None)
          } else {
            val e = expr(); expect(")")
            AggCall("COUNT", None, distinct = false, Nil, Nil, Some(e))
          }
        case "DEDUPE" =>
          // DEDUPE(<content expr>, <id field>) — exact content-hash dedup
          val content = expr()
          expect(",")
          val idField = next()
          expect(")")
          AggCall("DEDUPE", None, distinct = false, Seq(idField), Nil, Some(content))
        case "SEARCH" =>
          // SEARCH('<space-separated terms>', k) — BM25 top-k
          val q = next()
          if (!q.startsWith("'"))
            throw new BqlParseException(s"SEARCH needs a quoted term string, got '$q'")
          val terms = q.substring(1, q.length - 1).replace("\\'", "'")
          expect(",")
          val k = next().toInt
          if (k < 1) throw new BqlParseException(s"SEARCH k must be >= 1, got $k")
          expect(")")
          AggCall("SEARCH", Some(k), distinct = false, Nil, Nil, Some(Lit(terms)))
        case "TOP" =>
          val k = next().toInt
          expect(",")
          val fs = Vector.newBuilder[String]
          do fs += next() while (accept(","))
          expect(")")
          AggCall("TOP", Some(k), distinct = false, fs.result(), Nil, None)
        case "QUANTILE" | "PMF" | "CDF" =>
          // points: an explicit list, or bullet-core's generated forms
          // LINEAR(count) / REGION(start, end, increment)
          val f = next()
          val ps = Vector.newBuilder[Double]
          var linearN: Option[Int] = None
          if (accept(",")) peekUp match {
            case "LINEAR" =>
              next(); expect(",")
              val n = next().toInt
              if (n < 2) throw new BqlParseException(s"LINEAR needs >= 2 points, got $n")
              if (n > 10000) throw new BqlParseException(s"LINEAR point count $n exceeds 10000")
              // QUANTILE's domain is [0,1] probabilities — static points;
              // PMF/CDF's domain is the data's [min,max] — resolved at
              // result time (linearN carries the count to the compiler)
              if (fn == "QUANTILE") ps ++= (0 until n).map(i => i.toDouble / (n - 1))
              else linearN = Some(n)
            case "REGION" =>
              next(); expect(",")
              val lo = next().toDouble; expect(",")
              val hi = next().toDouble; expect(",")
              val step = next().toDouble
              if (step <= 0 || hi < lo)
                throw new BqlParseException(s"bad REGION($lo, $hi, $step): need start <= end, increment > 0")
              if (fn == "QUANTILE" && (lo < 0 || hi > 1))
                throw new BqlParseException(s"QUANTILE REGION bounds must lie in [0, 1], got [$lo, $hi]")
              val n = math.floor((hi - lo) / step + 1e-9).toInt
              if (n > 9999) throw new BqlParseException(
                s"REGION($lo, $hi, $step) generates ${n + 1} points (> 10000)")
              ps ++= (0 to n).map(i => lo + i * step)
            // MANUAL is bullet-core's explicit-list keyword — same
            // semantics as a bare list, accepted for drop-in parity
            case "MANUAL" =>
              next(); expect(",")
              ps += next().toDouble
              while (accept(",")) ps += next().toDouble
            case _ =>
              ps += next().toDouble
              while (accept(",")) ps += next().toDouble
          }
          expect(")")
          AggCall(fn, None, distinct = false, Seq(f), ps.result(), None, linearN)
        case _ =>
          val e = expr(); expect(")")
          AggCall(fn, None, distinct = false, Nil, Nil, Some(e))
      }
    }

    private def scalarCall(): Expr = {
      val fn = next().toUpperCase
      expect("(")
      fn match {
        case "IF" =>
          val c = expr(); expect(","); val a = expr(); expect(","); val b = expr(); expect(")")
          If(c, a, b)
        case "CAST" =>
          val e = expr(); expect(","); val ty = next(); expect(")")
          Cast(e, ty.toUpperCase)
        case "SAMPLE" =>
          // SAMPLE(<fraction>, <content expr>) — deterministic
          // content-keyed sampling predicate (the samp_hash_sample verb)
          val f = expr()
          expect(",")
          val e = expr()
          expect(")")
          Binary("SAMPLE", e, f)
        case "CONTAINSKEY" | "CONTAINSVALUE" | "SIZEIS" | "JSON" | "FILTER" =>
          val e = expr(); expect(","); val a = expr(); expect(")")
          Binary(fn, e, a)
        case _ =>
          val e = expr(); expect(")")
          Unary(fn, e)
      }
    }
  }
}
