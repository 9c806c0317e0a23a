package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

/** The two CC algorithms behind dd_dup_clusters: contract equivalence,
  * the O(log n) star convergence on the min-label worst case, and the
  * automatic threshold switch. */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession.local(4)

  private def pairsDf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def labelMap(r: ConnectedComponents.CcResult): Map[Long, Long] =
    r.labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

  test("alternating stars converges in O(log n) rounds on a 50-node chain") {
    // a path graph is min-label's worst case: diameter 49, so propagation
    // needs ~49 rounds; the star alternation must contract it in O(log n)
    val chain = pairsDf((0L until 49L).map(i => (i, i + 1)))
    val ml = ConnectedComponents.minLabel(chain, maxRounds = 8)
    assert(!ml.converged, "8 propagation rounds cannot close a 49-hop chain")
    val stars = ConnectedComponents.alternatingStars(chain, maxRounds = 50)
    assert(stars.converged)
    assert(stars.rounds <= 12, s"expected O(log n) rounds, took ${stars.rounds}")
    val labels = labelMap(stars)
    assert(labels == (0L to 49L).map(_ -> 0L).toMap)
  }

  test("min-label runs a deep chain to maxRounds without an analyzer cliff and labels it") {
    // 60 propagation rounds on a 60-hop chain: per-round convergence
    // actions re-analyze the labels plan, so this is the regression
    // fixture for lineage growth (localCheckpoint per round keeps each
    // round's plan flat — a persist-only loop stalls analysis long
    // before round 60). The chain needs exactly diameter rounds + 1
    // witness round, so converging inside the budget also pins that the
    // checkpoint swap did not change the algebra.
    val chain = pairsDf((0L until 60L).map(i => (i, i + 1)))
    val ml = ConnectedComponents.minLabel(chain, maxRounds = 70)
    assert(ml.converged, "min-label must close a 60-hop chain within 70 rounds")
    assert(labelMap(ml) == (0L to 60L).map(_ -> 0L).toMap)
  }

  test("min-label and alternating stars agree on a seeded random graph") {
    val rnd = new scala.util.Random(11)
    // ~3 components: edges within disjoint id ranges + noise singleton pairs
    val pairs =
      Seq.fill(40)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong)) ++
      Seq.fill(40)((100L + rnd.nextInt(15), 100L + rnd.nextInt(15))) ++
      Seq((500L, 501L), (501L, 502L), (502L, 500L)) // a triangle
    val df = pairsDf(pairs)
    val ml = ConnectedComponents.minLabel(df, maxRounds = 50)
    val stars = ConnectedComponents.alternatingStars(df, maxRounds = 50)
    assert(ml.converged && stars.converged)
    assert(labelMap(ml) == labelMap(stars))
  }

  test("components() switches to stars past the propagation threshold") {
    val chain = pairsDf((0L until 30L).map(i => (i, i + 1)))
    spark.conf.set(ConnectedComponents.LocalMaxEdgesKey, "0") // force distributed
    spark.conf.set(ConnectedComponents.MaxPropagationRoundsKey, "4")
    try {
      val labels = ConnectedComponents.components(chain).collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(labels == (0L to 30L).map(_ -> 0L).toMap)
    } finally {
      spark.conf.unset(ConnectedComponents.MaxPropagationRoundsKey)
      spark.conf.unset(ConnectedComponents.LocalMaxEdgesKey)
    }
  }

  test("driver union-find agrees with the distributed paths (random graph + self-loops)") {
    val rnd = new scala.util.Random(23)
    val pairs = Seq.fill(60)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong)) ++
      Seq((900L, 900L)) // self-pair-only node must be excluded on both paths
    val df = pairsDf(pairs)
    val local = ConnectedComponents.components(df).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    spark.conf.set(ConnectedComponents.LocalMaxEdgesKey, "0")
    try {
      val dist = ConnectedComponents.components(df).collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(local == dist)
      assert(!local.contains(900L))
    } finally spark.conf.unset(ConnectedComponents.LocalMaxEdgesKey)
  }

  test("dd_dup_clusters rows are identical through local, propagation, and star paths") {
    val sfDir = "/root/testdata/sf0.01"
    def rows() = SparkEntry.queries("dd_dup_clusters")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaLocal = rows() // small fixture graph takes the union-find path
    spark.conf.set(ConnectedComponents.LocalMaxEdgesKey, "0")
    try {
      val viaPropagation = rows()
      spark.conf.set(ConnectedComponents.MaxPropagationRoundsKey, "0") // force stars
      val viaStars = rows()
      assert(viaLocal.nonEmpty)
      assert(viaPropagation == viaLocal)
      assert(viaStars == viaLocal)
    } finally {
      spark.conf.unset(ConnectedComponents.MaxPropagationRoundsKey)
      spark.conf.unset(ConnectedComponents.LocalMaxEdgesKey)
    }
  }

  test("both algorithms return empty (not a crash) on an empty pair graph") {
    val empty = pairsDf(Seq.empty)
    assert(ConnectedComponents.minLabel(empty, 8).labels.count() == 0)
    assert(ConnectedComponents.alternatingStars(empty, 8).labels.count() == 0)
  }
}
