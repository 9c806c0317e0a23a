package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** THE SKETCH-REGIME GATE (sf0.1): the five oracle queries that
  * deliberately leave the exact regime at 10× the driver's fixture —
  * `b6_theta_distinct`, `b5_group_cap_probe`, `b7_kll_quantile`,
  * `b7_kll_grouped`, `op_join_estimate` — machine-checked against the
  * sketches' PUBLISHED error bounds instead of DuckDB equality. At
  * sf0.01 all five hash-match the oracle (the exact regime); at sf0.1
  * their cardinalities cross the Theta/KLL/HLL thresholds and the
  * answers become estimates — which is precisely the designed 100×
  * contract, so this spec is the machine form of what BASELINE.md
  * previously documented as prose: each estimate must sit within the
  * bound its sketch publishes, not merely "be a number".
  *
  * Published bounds used (DataSketches library, bundled with Spark):
  *  - Theta: relative standard error = 1/√(nominal entries)
  *    (datasketches.apache.org Theta accuracy; we assert 3·RSE).
  *  - HLL: RSE = 1.04/√(2^lgConfigK) (the classic HLL bound; 3·RSE).
  *  - KLL: normalized rank error from the library's own
  *    `KllSketch.getNormalizedRankError(k, pmf=false)` — the 99%-
  *    confidence published bound; we allow 2× for a 0-flake gate
  *    (KLL compaction is randomized, so per-run answers vary inside
  *    the bound).
  */
class SketchRegimeSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.1"
  private lazy val spark = GraftSession.local(8)
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def relErr(est: Double, exact: Double): Double =
    math.abs(est / exact - 1.0)

  /** theta_sketch_estimate returns LONG, hll/doubles vary — read any
    * numeric column as double. */
  private def num(r: org.apache.spark.sql.Row, i: Int): Double = r.get(i) match {
    case l: java.lang.Long => l.toDouble
    case d: java.lang.Double => d
    case n: java.lang.Number => n.doubleValue()
  }

  test("b6_theta_distinct: Theta/HLL estimates inside published bounds vs exact") {
    val r = run("b6_theta_distinct").collect().head
    val theta = num(r, 0); val hll = num(r, 1); val exact = num(r, 2)
    // Spark's theta_sketch_agg/hll_sketch_agg default to lgK=12 → 4096
    // nominal entries; Theta is EXACT below nominal (no sampling yet),
    // estimate-with-RSE=1/√k above. HLL is approximate once promoted
    // out of coupon mode regardless of cardinality.
    val thetaBound = if (exact <= 4096) 0.0 else 3.0 / math.sqrt(4096)
    val hllBound = 3.0 * 1.04 / math.sqrt(4096)
    info(f"exact=$exact%.0f theta=$theta%.2f (relErr=${relErr(theta, exact)}%.5f, bound=$thetaBound%.5f) " +
      f"hll=$hll%.2f (relErr=${relErr(hll, exact)}%.5f, bound=$hllBound%.5f)")
    assert(relErr(theta, exact) <= thetaBound,
      f"theta estimate $theta%.2f off exact $exact%.0f beyond 3·RSE")
    assert(relErr(hll, exact) <= hllBound,
      f"hll estimate $hll%.2f off exact $exact%.0f beyond 3·RSE")
  }

  test("b5_group_cap_probe: lgk=17 Theta group-count probe inside 3·RSE at 591k true groups") {
    val r = run("b5_group_cap_probe").collect().head
    val est = num(r, 0); val underCap = r.getBoolean(1)
    val exact = Tables.load(spark, sfDir, "lineitem")
      .agg(countDistinct(concat_ws("|", col("l_partkey"), col("l_suppkey"))).as("n"))
      .collect().head.getLong(0).toDouble
    val bound = if (exact <= 131072) 0.0 else 3.0 / math.sqrt(131072)
    info(f"exact=$exact%.0f est=$est%.2f relErr=${relErr(est, exact)}%.6f bound=$bound%.6f")
    assert(exact > 131072, "fixture no longer exercises the estimate regime — gate is vacuous")
    assert(relErr(est, exact) <= bound,
      f"group-count estimate $est%.2f off exact $exact%.0f beyond 3·RSE (lgk=17)")
    assert(!underCap, "under_cap must reflect the (far-over-500) estimate")
  }

  /** True rank band of value v among vs: [P(x < v), P(x <= v)] — the
    * KLL bound is on NORMALIZED RANK, so that's what we check (the
    * ApproxPercentileSpec technique, applied at sf0.1 scale). */
  private def rankBand(vs: Array[Double], v: Double): (Double, Double) = {
    val n = vs.length.toDouble
    (vs.count(_ < v) / n, vs.count(_ <= v) / n)
  }

  test("b7_kll_quantile: every point estimate within 2x the library's published rank error") {
    val eps = org.apache.datasketches.kll.KllSketch.getNormalizedRankError(65535, false)
    val tol = 2 * eps
    val vs = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_extendedprice")).collect().map(_.getDouble(0))
    assert(vs.length > 65535, "fixture below KLL capacity — gate is vacuous")
    val got = run("b7_kll_quantile").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(got.length == 7)
    got.foreach { case (p, v) =>
      val (lo, hi) = rankBand(vs, v)
      assert(p >= lo - tol && p <= hi + tol,
        f"quantile p=$p: estimate $v sits at rank [$lo%.6f,$hi%.6f], tol=$tol%.6f (k=65535, n=${vs.length})")
    }
    info(f"n=${vs.length}, published eps(k=65535)=$eps%.6f, gate tol=$tol%.6f, 7/7 points in band")
  }

  test("b7_kll_grouped: per-group estimates within 2x published rank error") {
    val eps = org.apache.datasketches.kll.KllSketch.getNormalizedRankError(65535, false)
    val tol = 2 * eps
    val byFlag = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .groupBy(_.getString(0)).map { case (f, rs) => f -> rs.map(_.getDouble(1)) }
    assert(byFlag.values.forall(_.length > 65535), "a group fell below KLL capacity — gate is vacuous")
    val got = run("b7_kll_grouped").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == 9) // 3 flags x 3 points
    got.foreach { case (flag, p, v) =>
      val (lo, hi) = rankBand(byFlag(flag), v)
      assert(p >= lo - tol && p <= hi + tol,
        f"group $flag p=$p: estimate $v at rank [$lo%.6f,$hi%.6f], tol=$tol%.6f")
    }
    info(f"3 groups x ~200k rows, tol=$tol%.6f, 9/9 points in band")
  }

  test("op_join_estimate: lgk=17 cardinalities inside 3·RSE; size estimate within compounded bound") {
    val r = run("op_join_estimate").collect().head
    val rowsA = r.getLong(0); val ka = num(r, 1)
    val rowsB = r.getLong(2); val kb = num(r, 3)
    val kBoth = num(r, 4); val est = r.getLong(5); val actual = r.getLong(6)
    val exactKa = Tables.load(spark, sfDir, "orders")
      .agg(countDistinct(col("o_orderkey"))).collect().head.getLong(0).toDouble
    val exactKb = Tables.load(spark, sfDir, "lineitem")
      .agg(countDistinct(col("l_orderkey"))).collect().head.getLong(0).toDouble
    assert(exactKa > 131072, "orders keys below the sketch threshold — gate is vacuous")
    val rse = 1.0 / math.sqrt(131072)
    info(f"ka=$ka%.1f/$exactKa%.0f kb=$kb%.1f/$exactKb%.0f kBoth=$kBoth%.1f " +
      f"est=$est actual=$actual (ratio=${est.toDouble / actual}%.4f)")
    // exact intersection computed, not assumed: the sf0.1 fixture has
    // orders with no lineitem (150000 vs 147236 distinct keys)
    val exactBoth = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .agg(countDistinct(col("o_orderkey"))).collect().head.getLong(0).toDouble
    assert(relErr(ka, exactKa) <= 3 * rse, f"ka $ka%.1f off exact $exactKa%.0f beyond 3·RSE")
    assert(relErr(kb, exactKb) <= 3 * rse, f"kb $kb%.1f off exact $exactKb%.0f beyond 3·RSE")
    // the intersection inherits both sketches' error
    assert(relErr(kBoth, exactBoth) <= 3 * 2 * rse, f"k_both $kBoth%.1f off exact $exactBoth%.0f beyond compounded bound")
    // est_rows = k_both·(rows_a/ka)·(rows_b/kb): three ±3·RSE factors →
    // the size estimate must land within ~4x the single-sketch bound
    assert(relErr(est.toDouble, actual.toDouble) <= 4 * 3 * rse,
      f"join size estimate $est vs actual $actual beyond the compounded sketch bound")
    assert(rowsA == 150000L && rowsB == 600000L, "fixture row counts drifted")
  }
}
