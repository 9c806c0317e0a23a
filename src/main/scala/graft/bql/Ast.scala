package graft.bql

/** BQL abstract syntax — the query surface of the reference engine.
  *
  * The reference receives pre-built bullet-core `Query` ASTs over PubSub
  * (`/root/reference/src/main/scala/com/yahoo/bullet/spark/utils/BulletSparkUtils.scala:36-38`
  * deserializes them; the textual BQL→AST step lives in Bullet's web
  * service, outside the repo). Our engine owns the whole path, so the AST
  * mirrors the bullet-core query model (SURVEY.md §2.B): filter →
  * projection → aggregation → window → post-aggregations, plus duration.
  */
object Ast {

  // ---- expressions (B3) ----
  sealed trait Expr
  final case class FieldRef(path: String) extends Expr
  final case class Lit(value: Any) extends Expr
  final case class ListLit(items: Seq[Expr]) extends Expr
  final case class Unary(op: String, e: Expr) extends Expr // NOT, -, SIZEOF, ISNULL, ISNOTNULL, ABS, LOWER, UPPER, TRIM
  final case class Binary(op: String, l: Expr, r: Expr) extends Expr // + - * / % == != > >= < <= AND OR XOR LIKE RLIKE IN
  final case class If(cond: Expr, t: Expr, f: Expr) extends Expr
  /** Comparison with a quantifier over a list: `x > ANY (1, 2)` /
    * `x == ALL field_of_list` (reference BinaryExpression ANY/ALL
    * modifiers, SURVEY §2.B B3). */
  final case class Quantified(op: String, l: Expr, all: Boolean, list: Expr) extends Expr
  final case class Between(e: Expr, lo: Expr, hi: Expr) extends Expr
  final case class Cast(e: Expr, to: String) extends Expr
  /** Parser-internal: aggregate call in a select list; resolved into an
    * [[Agg]] before the Query is built and never reaches the compiler. */
  private[bql] final case class AggCall(fn: String, arg0: Option[Int], distinct: Boolean,
      fields: Seq[String], probs: Seq[Double], arg: Option[Expr],
      linearN: Option[Int] = None) extends Expr

  // ---- select list (B2) ----
  final case class SelectItem(expr: Expr, alias: Option[String])

  /** `LATERAL VIEW [OUTER] EXPLODE(expr) AS a [, b]` (bullet-bql's
    * explode surface): one alias explodes a list to one row per element;
    * two aliases explode a map to (key, value) rows. `outer` keeps a row
    * with null element(s) when the collection is empty/null. The stage
    * runs before WHERE, so the alias is referenceable everywhere
    * downstream (filter, grouping, select). */
  final case class LateralView(expr: Expr, aliases: Seq[String], outer: Boolean)

  // ---- aggregations (B4-B8) ----
  sealed trait Agg
  case object RawAll extends Agg // SELECT * / plain projection (RAW)
  final case class GroupAgg(keys: Seq[SelectItem], ops: Seq[AggOp]) extends Agg // GROUP BY (or GroupAll when keys empty)
  final case class CountDistinctAgg(fields: Seq[String], name: String) extends Agg
  final case class TopKAgg(k: Int, fields: Seq[String], countName: String) extends Agg
  final case class QuantileAgg(field: String, probs: Seq[Double], name: String) extends Agg
  /** DISTRIBUTION PMF/CDF (B7): bin counts / cumulative probabilities at
    * the given split points. `linearN = Some(n)` is bullet-core's
    * generated-points form (LINEAR, n): n points evenly spaced between
    * the DATA min and max, resolved at result time. */
  final case class PmfAgg(field: String, points: Seq[Double], cdf: Boolean, name: String,
      linearN: Option[Int] = None) extends Agg
  /** `SELECT DEDUPE(<content expr>, <id field>)` — exact content-hash
    * dedup (the LLM-pipeline `dd_exact` verb as query text): groups by
    * md5 of the content expression, emits (h, keep_id = min id,
    * n_copies) — the keep-lowest-id dedup manifest. */
  final case class DedupeAgg(content: Expr, idField: String) extends Agg
  /** `SELECT SEARCH('<terms>', k)` — Okapi BM25 top-k over (doc_id,
    * text) rows (the `srch_bm25` verb as query text): emits
    * (doc_id, rank, score_micro). */
  final case class SearchAgg(terms: Seq[String], k: Int) extends Agg

  final case class AggOp(fn: String, arg: Option[Expr], name: String) // COUNT SUM MIN MAX AVG

  // ---- windows (B13) ----
  sealed trait WindowUnit
  case object TimeUnit extends WindowUnit
  case object RecordUnit extends WindowUnit
  /** includeAll=true = `ALL` (cumulative since query start); false =
    * `WINDOW` (reset after each emit — tumbling). */
  final case class WindowSpec(every: Long, unit: WindowUnit, includeAll: Boolean)

  // ---- post-aggregations (B9-B12) ----
  final case class OrderItem(expr: Expr, desc: Boolean)

  /** The conf keys a BQL `SET` statement may touch — an ALLOWLIST, not a
    * prefix check: accuracy levers a query author may legitimately hold
    * (the per-query sketch knobs and the armed sketch-mode switches).
    * Privileged engine conf — store/index paths, caps, guards — stays
    * the embedding application's privilege; a text query naming one is a
    * parse error. */
  val SettableKeys: Set[String] = Set(
    "spark.graft.bql.theta.lgk", "spark.graft.bql.kll.k",
    "spark.graft.approxDistinct",
    "spark.graft.approxPercentile", "spark.graft.approxPercentile.k",
    "spark.graft.approxTopK", "spark.graft.approxTopK.maxItemsTracked",
    "spark.graft.topk.rewriteMaxK")

  /** A complete query (B14: durationMs; limit doubles as RAW size).
    * `copyAll` = the reference's Projection COPY mode (`SELECT *, expr`):
    * keep every original field and add the computed items.
    * `settings` = leading `SET <key> = v;` statements — the text
    * surface's lever for the armed sketch modes and the BQL sketch knobs;
    * only [[SettableKeys]] parse, anything else is a BqlParseException. */
  final case class Query(
      select: Seq[SelectItem], // empty = SELECT *
      where: Option[Expr],
      agg: Agg,
      having: Option[Expr],
      orderBy: Seq[OrderItem],
      limit: Option[Int],
      window: Option[WindowSpec],
      durationMs: Option[Long],
      culling: Seq[String],
      copyAll: Boolean = false,
      lateral: Option[LateralView] = None,
      settings: Seq[(String, String)] = Nil)
}
