package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{cosine_sim, dot_product, lsh_bucket, topk_min}
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two paths, per the standard ANN playbook:
  *  - brute-force cosine top-k: the exact baseline. The query side is tiny
  *    (a handful of probe vectors) so Catalyst broadcasts it; the corpus
  *    side streams through one codegen'd pass — no shuffle of the corpus,
  *    linear scale-out across executors.
  *  - LSH-bucketed: random-hyperplane buckets (graft.functions.lsh_bucket)
  *    turn the all-pairs problem into an equi-join on bucket; multi-probe
  *    (flipping one bit) trades recall for fan-out. At 100 TB only
  *    (id, bucket, vec) pairs reach the join, and each probe touches
  *    ~corpus/2^nBits vectors.
  */
/** Spherical k-means coarse quantizer shared by IVF search
  * (`ann_ivf_topk`) and semantic dedup (`dd_semdedup`). Training touches a
  * bounded deterministic sample; assignment is a linear codegen'd pass
  * against broadcast-literal centroids. */
private[graft] object Ivf {

  def intConf(s: SparkSession, key: String, dflt: Int): Int =
    s.conf.getOption(key).map(_.toInt).getOrElse(dflt)

  /** Similarity-to-each-centroid as an array of (score, idx) structs;
    * natural struct ordering makes array_max/sort_array an argmax with a
    * deterministic index tiebreak. */
  def simStructs(v: Column, cents: Seq[Array[Float]]): Column =
    array(cents.zipWithIndex.map { case (c, i) =>
      struct(graft.functions.cosine_sim(v, typedLit(c)).as("s"), lit(i).as("i"))
    }: _*)

  /** Nearest-centroid index for a vector column.
    *
    * Scale note: this compiles k cosine calls into one codegen projection
    * — the right shape for coarse quantizers up to k ≈ low hundreds
    * (fixtures use 10-20). An index sized k = √corpus at 100 TB (k in
    * the thousands) takes [[assignedByJoin]] instead (a many-thousand-
    * element literal array expression defeats codegen); [[assigned]]
    * switches on `spark.graft.ivf.joinAssignThreshold`. */
  def assign(v: Column, cents: Seq[Array[Float]]): Column =
    array_max(simStructs(v, cents)).getField("i")

  /** Corpus assignment `(vec_id, embedding, cl)` — picks the literal-array
    * path below the k threshold, the broadcast-join path at or above it. */
  def assigned(e: DataFrame, cents: Seq[Array[Float]]): DataFrame = {
    val threshold = intConf(e.sparkSession, "spark.graft.ivf.joinAssignThreshold", 256)
    if (cents.size >= threshold) assignedByJoin(e, cents)
    else e.select(col("vec_id"), col("embedding"), assign(col("embedding"), cents).as("cl"))
  }

  /** Join-shaped assignment for large k: broadcast the centroids as a
    * DATAFRAME (k rows survive any k — no k-term expression tree), expand
    * each vector to k scored rows map-side via BroadcastNestedLoopJoin,
    * and reduce to the argmax with `max(struct(score, ci))` — partial
    * aggregation collapses the k rows per vector before the exchange, so
    * the ONE corpus shuffle carries (vec_id, embedding, 1 struct), never
    * k scores. Tiebreak matches [[assign]] exactly: struct ordering =
    * best score, then highest centroid index. */
  def assignedByJoin(e: DataFrame, cents: Seq[Array[Float]]): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val cdf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toDF("__ci", "__cent")
    e.crossJoin(broadcast(cdf))
      .select(col("vec_id"), col("embedding"),
        struct(graft.functions.cosine_sim(col("embedding"), col("__cent")).as("s"),
          col("__ci").as("i")).as("__sc"))
      .groupBy(col("vec_id"))
      .agg(first(col("embedding")).as("embedding"),
        max(col("__sc")).getField("i").as("cl"))
  }

  /** Multi-assignment `(vec_id, cl)` — one row per vector per its
    * nAssign nearest clusters (semantic dedup's boundary-pair recovery).
    * Same literal/join split as [[assigned]]: below the threshold the
    * nAssign picks come from a sorted literal struct array; at or above
    * it (index-scale k, where a k-term expression tree defeats codegen)
    * the centroids broadcast as a DataFrame and the per-vector top
    * nAssign is the bounded-heap topk_min — partial aggregation keeps
    * nAssign structs per vector map-side, so the ONE corpus exchange
    * carries (vec_id, nAssign entries), never k scores. Tiebreak parity
    * with the literal path (best score, then HIGHEST index) is encoded
    * by negating both fields of the ordering struct; forced-path
    * row-parity is spec-gated (ApproxSuiteSpec). */
  def multiAssigned(e: DataFrame, cents: Seq[Array[Float]], nAssign: Int): DataFrame = {
    val threshold = intConf(e.sparkSession, "spark.graft.ivf.joinAssignThreshold", 256)
    if (cents.size < threshold)
      e.select(col("vec_id"),
        explode(transform(
          slice(sort_array(simStructs(col("embedding"), cents), asc = false), 1, nAssign),
          x => x.getField("i"))).as("cl"))
    else {
      val s = e.sparkSession
      import s.implicits._
      val cdf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toDF("__ci", "__cent")
      e.crossJoin(broadcast(cdf))
        .select(col("vec_id"),
          struct((-graft.functions.cosine_sim(col("embedding"), col("__cent"))).as("ns"),
            (-col("__ci")).as("nci")).as("__sc"))
        .groupBy(col("vec_id"))
        .agg(graft.functions.topk_min(col("__sc"), nAssign).as("tk"))
        .select(col("vec_id"), explode(col("tk")).as("st"))
        .select(col("vec_id"), (-col("st.nci")).as("cl"))
    }
  }

  /** Compact a segment-append postings store (`ss_ivf_maintain`'s
    * `batch=<id>` layout) into the cl-partitioned inverted-list layout
    * `fg_ivf_delete` edits — the seam between live ingest and the
    * serving/deletion store: one scan of the segments, one repartition
    * by list, one partitioned write; after the swap, ingest truncates
    * the compacted segments. The postings SET is unchanged (and
    * [[graft.queries.SimilarityQueries.ivfProbeSearch]] reads either
    * layout), so serving is bit-identical before and after —
    * IndexPersistenceSpec gates it. Centroid RETRAIN, if due, happens
    * here too: this is the one moment the corpus is rewritten anyway. */
  def compactSegments(s: SparkSession, segRoot: String, listRoot: String): Unit =
    s.read.parquet(segRoot)
      .select(col("vec_id"), col("embedding"), col("cl"))
      // explicit width: keyed-only repartition AQE-coalesces small inputs
      // to one task writing every cl= dir serially
      .repartition(s.sparkContext.defaultParallelism, col("cl"))
      .write.partitionBy("cl").mode("overwrite").parquet(listRoot)

  /** The maintenance POLICY around [[compactSegments]] — what a live
    * `ss_ivf_maintain` store runs after each segment append so segments
    * can never accumulate unboundedly. Layout under `storeRoot`:
    * `seg/batch=<id>` live segments, `lists_upto_<B>/cl=<c>` the one
    * compacted inverted-list store covering every batch id ≤ B. When
    * live segments exceed `threshold`, all of them + the previous
    * compacted store fold into a NEW `lists_upto_<maxId>` (write to a
    * fresh dir, then swap — readers never see a partial store), and the
    * superseded dirs are deleted. The watermark B lives in the dir NAME,
    * so a failed micro-batch that re-executes an already-compacted
    * segment append (at-least-once foreachBatch) is harmless:
    * [[servingSegments]] ignores `batch=<id>` dirs with id ≤ B instead
    * of double-counting them. Amortized cost: each vector is rewritten
    * once per compaction — O(|store| / threshold) per batch, the
    * BucketedStore bound. */
  def compactIfDue(s: SparkSession, storeRoot: String, threshold: Int): Unit = {
    val segs = liveSegDirs(storeRoot)
    if (segs.size > threshold) {
      val upto = segs.map(_._1).max
      val prev = listsDir(storeRoot)
      val segFrames = s.read
        .schema("vec_id LONG, embedding ARRAY<FLOAT>, cl INT")
        .parquet(segs.map(_._2): _*)
      val input = prev match {
        case Some((_, dir)) => segFrames.unionByName(
          s.read.option("basePath", dir).parquet(dir)
            .select(col("vec_id"), col("embedding"),
              col("cl").cast("int").as("cl")))
        case None => segFrames
      }
      val target = s"$storeRoot/lists_upto_$upto"
      input.repartition(s.sparkContext.defaultParallelism, col("cl"))
        .write.partitionBy("cl").mode("overwrite").parquet(target)
      (segs.map(_._2) ++ prev.map(_._2)).foreach(d =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    }
  }

  /** The live serving view of a seg+lists store: the compacted lists
    * (one scan, `cl` recovered as the partition column) unioned with the
    * live segments past the compaction watermark. */
  def servingFrame(s: SparkSession, storeRoot: String): DataFrame = {
    val watermark = listsDir(storeRoot).map(_._1).getOrElse(Long.MinValue)
    val segPaths = liveSegDirs(storeRoot)
      .collect { case (id, dir) if id > watermark => dir }
    val parts = listsDir(storeRoot).toSeq.map { case (_, dir) =>
      s.read.option("basePath", dir).parquet(dir)
        .select(col("vec_id"), col("embedding"), col("cl").cast("int").as("cl"))
    } ++ (if (segPaths.nonEmpty) Seq(s.read
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, cl INT")
      .parquet(segPaths: _*)) else Nil)
    require(parts.nonEmpty, s"empty IVF store at $storeRoot")
    parts.reduce(_.unionByName(_))
  }

  private def liveSegDirs(storeRoot: String): Seq[(Long, String)] =
    Option(new java.io.File(s"$storeRoot/seg").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(f => (f.getName.stripPrefix("batch=").toLong, f.getPath)).toSeq

  private def listsDir(storeRoot: String): Option[(Long, String)] =
    Option(new java.io.File(storeRoot).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("lists_upto_"))
      .map(f => (f.getName.stripPrefix("lists_upto_").toLong, f.getPath))
      .sortBy(_._1).lastOption


  /** Train centroids: deterministic farthest-point init over a hash-min
    * candidate pool, then `iters` Lloyd passes — ON THE DRIVER, over the
    * bounded sample collected once. The sample is ≤ `trainSample` vectors
    * by construction (the whole point of sampling is that it fits), so
    * iterating on it distributed would pay a full Spark job of fixed
    * latency per pass to average 2,000 rows; one TakeOrdered collect +
    * in-process Lloyd costs the same work with one job. The corpus-sized
    * ASSIGNMENT pass stays distributed (broadcast-literal centroids,
    * codegen cosine). `e` must have (vec_id, embedding) columns. */
  def train(e: DataFrame, kClusters: Int, iters: Int, trainSample: Int): Seq[Array[Float]] = {
    // hash-ordered sample fetch is TakeOrderedAndProject (per-partition
    // heaps), not a global sort; rows arrive hash-ordered so the head of
    // the array doubles as the farthest-point candidate pool
    val sample: Array[Array[Float]] = e.orderBy(xxhash64(col("vec_id"))).limit(trainSample)
      .collect().map(_.getSeq[Float](1).toArray)
    require(sample.nonEmpty, "cannot train a quantizer on an empty corpus")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) -1.0 else dot / math.sqrt(na * nb)
    }
    // deterministic init: farthest-point (k-center) selection over the
    // pool — k random seeds would leave natural clusters unseeded
    // (coupon collector), farthest-point spreads them.
    val pool = sample.take(math.max(100, 2 * kClusters))
    var cents: Seq[Array[Float]] = {
      val chosen = scala.collection.mutable.ArrayBuffer(pool.head)
      while (chosen.size < kClusters) {
        chosen += pool.maxBy(c => -chosen.map(cos(c, _)).max)
      }
      chosen.toSeq
    }
    val dim = sample.head.length
    (0 until iters).foreach { _ =>
      val sums = Array.fill(kClusters)(new Array[Double](dim))
      val counts = new Array[Long](kClusters)
      sample.foreach { v =>
        // argmax with the same tiebreak as the distributed assign()
        // (struct ordering: best score, then HIGHEST index)
        var best = 0; var bestS = cos(v, cents(0))
        var ci = 1
        while (ci < kClusters) {
          val sc = cos(v, cents(ci))
          if (sc >= bestS) { best = ci; bestS = sc }
          ci += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (old, ci) =>
        if (counts(ci) == 0) old // empty cluster keeps its centroid
        else {
          val mean = sums(ci).map(_ / counts(ci))
          val norm = math.sqrt(mean.map(x => x * x).sum)
          if (norm > 0) mean.map(x => (x / norm).toFloat) else old
        }
      }
    }
    cents
  }
}

/** Product-quantization codebooks: the vector is split into `m` contiguous
  * subvectors and each subspace gets its own small L2 k-means codebook
  * (trained on the same bounded driver sample as [[Ivf]]). A vector
  * compresses to m byte-sized codes — 64 float32s (256 B) become 8 B at
  * m=8, k=16 — so the SEARCH scan reads 32× less than the raw corpus.
  * Distances are computed asymmetrically (ADC): the query stays exact,
  * the corpus side is reconstructed per subspace from the code's centroid. */
private[graft] object Pq {

  /** Per-subspace codebooks via farthest-point init + Lloyd on the driver
    * sample (same rationale as Ivf.train: the sample is bounded by
    * construction, one collect beats per-pass job latency). L2 metric —
    * PQ approximates the vector itself, not its direction, so centroids
    * are plain means (no normalization). Returns m codebooks of k
    * centroids each, subDim floats per centroid. */
  def train(sample: Array[Array[Float]], m: Int, k: Int, iters: Int): Seq[Seq[Array[Float]]] = {
    require(sample.nonEmpty, "cannot train a quantizer on an empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by $m subspaces")
    val subDim = dim / m
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    (0 until m).map { mi =>
      val sub = sample.map(_.slice(mi * subDim, (mi + 1) * subDim))
      val pool = sub.take(math.max(100, 2 * k))
      var cents: Seq[Array[Float]] = {
        val chosen = scala.collection.mutable.ArrayBuffer(pool.head)
        while (chosen.size < k) chosen += pool.maxBy(c => chosen.map(l2(c, _)).min)
        chosen.toSeq
      }
      (0 until iters).foreach { _ =>
        val sums = Array.fill(k)(new Array[Double](subDim))
        val counts = new Array[Long](k)
        sub.foreach { v =>
          // argmin L2 == argmax (2·dot − |c|²); >= keeps the HIGHEST index
          // on ties, matching the distributed encode's struct ordering
          var best = 0; var bestS = -l2(v, cents(0))
          var ci = 1
          while (ci < k) {
            val sc = -l2(v, cents(ci))
            if (sc >= bestS) { best = ci; bestS = sc }
            ci += 1
          }
          var j = 0
          while (j < subDim) { sums(best)(j) += v(j); j += 1 }
          counts(best) += 1
        }
        cents = cents.zipWithIndex.map { case (old, ci) =>
          if (counts(ci) == 0) old
          else sums(ci).map(x => (x / counts(ci)).toFloat)
        }
      }
      cents
    }
  }

  /** Reconstructed squared norms per codebook entry (ADC denominators). */
  def norms(books: Seq[Seq[Array[Float]]]): Seq[Array[Double]] =
    books.map(_.map(c => c.map(x => x.toDouble * x).sum).toArray)

  /** Codegen ENCODE pass over `(vec_id, embedding)`: m byte-sized code
    * columns `c0..c{m-1}` (per-subspace argmin L2 as argmax(2·dot − |c|²,
    * idx) — constant |sub|² dropped, struct ordering keeps the highest
    * index on ties like the driver trainer) plus the reconstructed
    * squared norm `rn2`. This IS the codes table a deployment persists
    * once per corpus snapshot (IndexStore); every later search scans only
    * its output. */
  def encode(e: DataFrame, books: Seq[Seq[Array[Float]]], subDim: Int): DataFrame = {
    val m = books.size
    val ns = norms(books)
    def sub(v: Column, mi: Int): Column = slice(v, mi * subDim + 1, subDim)
    val codeCols = (0 until m).map { mi =>
      array_max(array(books(mi).zipWithIndex.map { case (c, k) =>
        struct(
          (graft.functions.dot_product(sub(col("embedding"), mi), typedLit(c)) * 2 - ns(mi)(k))
            .as("s"),
          lit(k).as("i"))
      }: _*)).getField("i").as(s"c$mi")
    }
    val rn2 = (0 until m).map(mi => element_at(typedLit(ns(mi)), col(s"c$mi") + 1)).reduce(_ + _)
    e.select(col("vec_id") +: codeCols: _*).withColumn("rn2", rn2)
  }
}

object SimilarityQueries {

  private def emb(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "embeddings")

  private[graft] val K = 10
  private[graft] val NQueries = 5
  /** Probe-set size for kNN classification — larger than NQueries so the
    * vote table is a meaningful accuracy sample, still broadcast-tiny. */
  private val NClassify = 50

  /** Per-probe top-k rank over a scored candidate frame
    * `(qid, vec_id, cos)` — by cos desc, vec_id asc, emitting
    * `(qid, rank, vec_id)` ordered, exactly the old
    * `row_number().over(partitionBy(qid))` contract WITHOUT the window:
    * the bounded-heap aggregate keeps <= k rows per probe per map task,
    * so the exchange carries |probes| x k rows however large the scored
    * candidate set is (for the PQ ADC pass that set is the whole corpus).
    * Negated cos encodes the descending key; (cos, vec_id) is unique per
    * probe, so the ordering is total and the result deterministic. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("qid"))
      .agg(topk_min(struct((-col("cos")).as("nc"), col("vec_id").as("vec_id")), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "st")))
      .select(col("qid"), (col("pos") + 1).as("rank"), col("st.vec_id").as("vec_id"))
      .orderBy(col("qid"), col("rank"))

  /** The search half of the PQ pipeline: ADC shortlist over a CODES table
    * (persisted or freshly encoded — `(vec_id, c0.., rn2)`) + exact-cosine
    * refine. `vectors` is touched only for the probe set and the
    * shortlist point-fetch (|probes| x shortK rows), so a deployment that
    * persisted the codes table (IndexStore + Pq.encode) pays scan IO of
    * codes alone — the "search reads only codes" contract, proven
    * row-identical to the self-contained query in IndexPersistenceSpec. */
  private[graft] def pqSearch(codes: DataFrame, vectors: DataFrame,
      books: Seq[Seq[Array[Float]]], subDim: Int, shortK: Int): DataFrame = {
    val m = books.size
    val probes = vectors.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        dot_product(col("embedding"), col("embedding")).as("qn"))
    def sub(v: Column, mi: Int): Column = slice(v, mi * subDim + 1, subDim)
    val adc = (0 until m).map { mi =>
      dot_product(sub(col("qe"), mi), element_at(typedLit(books(mi).map(_.toSeq)), col(s"c$mi") + 1))
    }.reduce(_ + _)
    // shortlist rank: the ADC pass scores the ENTIRE corpus per probe,
    // so this is the one stage where ranking shape decides 100 TB
    // viability — the bounded-heap aggregate keeps <= shortK rows per
    // probe per map task and the exchange carries |probes| x shortK
    // rows, vs. a per-probe window sort that would shuffle every
    // scored row into |probes| reducers
    val shortlist = codes.join(broadcast(probes), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), (adc / sqrt(col("qn") * col("rn2"))).as("acos"))
      .groupBy(col("qid"))
      .agg(topk_min(struct((-col("acos")).as("na"), col("vec_id").as("vec_id")), shortK).as("tk"))
      .select(col("qid"), explode(col("tk")).as("st"))
      .select(col("qid"), col("st.vec_id").as("vec_id"))
    // refine: exact cosine over the shortlist only — both joins
    // broadcast (|queries|·shortlist rows), the corpus is never
    // shuffled and only shortlisted vectors are fetched
    rankTopK(vectors.join(broadcast(shortlist), Seq("vec_id"))
      .join(broadcast(probes), Seq("qid"))
      .select(col("qid"), col("vec_id"),
        (dot_product(col("qe"), col("embedding")) /
          sqrt(col("qn") * dot_product(col("embedding"), col("embedding")))).as("cos")), K)
  }

  /** The IVF scaling rule: an explicit conf pins (kClusters, nProbe)
    * verbatim (spec fixtures, deployments that know their data);
    * otherwise kClusters = kOfN(corpus count — parquet metadata, no scan)
    * and nProbe holds scanned-list coverage at
    * `spark.graft.ivf.coverage`. Centroid count growing with sqrt(corpus)
    * + fixed coverage is what keeps recall FLAT as the corpus grows —
    * fixed knobs decay (0.64 → 0.50 across one 4x step, round-13 gates)
    * because each list's candidate pool grows while the probed fraction
    * shrinks relative to structure. */
  private def ivfGeometry(s: SparkSession, d: String,
      kConfKey: String, npConfKey: String, kOfN: Long => Int): (Int, Int) = {
    val coverage = s.conf.get("spark.graft.ivf.coverage", "0.375").toDouble
    val k = s.conf.getOption(kConfKey).map(_.toInt)
      .getOrElse(kOfN(emb(s, d).count()))
    val np = s.conf.getOption(npConfKey).map(_.toInt)
      .getOrElse(math.max(3, math.ceil(coverage * k).toInt))
    (k, math.min(k, np))
  }

  /** The SERVING half of every IVF surface — the self-contained queries
    * here, the maintained-index twin (`ss_ivf_maintain`) and the
    * deletion path (`fg_ivf_delete`) all rank through this one tree, so
    * a store-served search cannot silently diverge from the
    * freshly-assigned one. `corpus` is an IVF postings frame
    * `(vec_id, embedding, cl)` — freshly assigned or read back from a
    * persisted/maintained store. Probe-list selection is the same
    * nearest-clusters problem as semdedup's multi-assignment — shared
    * Ivf.multiAssigned, so index-scale k takes the join path on the
    * probe side too (a k-term literal expression is a compile-time
    * problem regardless of the row count it runs over); candidates are
    * the probes' nProbe lists only, scored with exact cosine into the
    * bounded-heap rankTopK. */
  private[graft] def ivfProbeSearch(corpus: DataFrame, probeBase: DataFrame,
      cents: Seq[Array[Float]], nProbe: Int): DataFrame = {
    val probes = Ivf.multiAssigned(probeBase, cents, nProbe)
      .withColumnRenamed("vec_id", "qid")
      .join(probeBase.select(col("vec_id").as("qid"), col("embedding").as("qe")), Seq("qid"))
    rankTopK(corpus.join(broadcast(probes),
        Seq("cl")).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cosine_sim(col("qe"), col("embedding")).as("cos")), K)
  }

  /** Shared IVF search body: train (bounded driver Lloyd), assign the
    * corpus (literal or join-shaped per the k threshold — Ivf.assigned),
    * probe the nProbe nearest lists with exact cosine. */
  private def ivfSearch(s: SparkSession, d: String, kClusters: Int, nProbe: Int): DataFrame = {
    val iters = Ivf.intConf(s, "spark.graft.ivf.iters", 3)
    val trainSample = Ivf.intConf(s, "spark.graft.ivf.trainSample", 2000)
    val e = emb(s, d).select(col("vec_id"), col("embedding"))
    val cents = Ivf.train(e, kClusters, iters, trainSample)
    ivfProbeSearch(Ivf.assigned(e, cents), e.filter(col("vec_id") < NQueries),
      cents, nProbe)
  }

  val defs: Seq[QueryDef] = Seq(

    // Brute-force cosine top-k per probe vector (exact ANN baseline).
    // Output is (query id, rank, neighbor id): integer-only, hash-stable.
    QueryDef("ann_brute_topk", Some(
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < $NQueries),
         |  c AS (SELECT q.qid, e.vec_id,
         |    list_sum(list_transform(list_zip(q.qe, e.embedding), x -> CAST(x[1] AS DOUBLE) * x[2]))
         |      / sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * x))
         |           * list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x))) AS cos
         |  FROM q, embeddings e WHERE e.vec_id <> q.qid)
         |SELECT qid, rank, vec_id FROM (
         |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
         |  FROM c) WHERE rank <= $K ORDER BY qid, rank""".stripMargin)) { (s, d) =>
      val e = emb(s, d).select(col("vec_id"), col("embedding"),
        dot_product(col("embedding"), col("embedding")).as("nsq"))
      val q = e.select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nsq").as("qn"))
        .filter(col("qid") < NQueries)
      rankTopK(e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (dot_product(col("qe"), col("embedding")) / sqrt(col("qn") * col("nsq"))).as("cos")), K)
    },

    // Filtered vector search: top-k restricted to candidates passing a
    // metadata predicate (here label % 2 = 0) — the "filtered ANN" every
    // vector store names as a first-class feature (search within a
    // tenant/category/date slice). Pre-filtering is the Spark-native win:
    // the predicate composes into the scan (PushedFilters on the
    // candidate side), so selectivity cuts the distance work
    // proportionally instead of post-filtering a too-small top-k. Same
    // broadcast-probe single-pass shape as ann_brute_topk.
    QueryDef("ann_filtered_topk", Some(
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < $NQueries),
         |  c AS (SELECT q.qid, e.vec_id,
         |    list_sum(list_transform(list_zip(q.qe, e.embedding), x -> CAST(x[1] AS DOUBLE) * x[2]))
         |      / sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * x))
         |           * list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x))) AS cos
         |  FROM q, embeddings e WHERE e.vec_id <> q.qid AND e.label % 2 = 0)
         |SELECT qid, rank, vec_id FROM (
         |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
         |  FROM c) WHERE rank <= $K ORDER BY qid, rank""".stripMargin)) { (s, d) =>
      val all = emb(s, d)
      val e = all.filter(col("label") % 2 === 0)
        .select(col("vec_id"), col("embedding"),
          dot_product(col("embedding"), col("embedding")).as("nsq"))
      val q = all.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          dot_product(col("embedding"), col("embedding")).as("qn"))
      rankTopK(e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (dot_product(col("qe"), col("embedding")) / sqrt(col("qn") * col("nsq"))).as("cos")), K)
    },

    // LSH-bucketed ANN: multi-table random-hyperplane LSH (L tables x b
    // bits, 1-bit multi-probe on the query side). Bits per table scale
    // with log(corpus/bucket-target) — 4 bits suits the 500-5000-vector
    // fixtures; a 100 TB corpus raises b, not the plan shape. Approximate
    // → rows-only driver check; recall vs brute force in ApproxSuiteSpec.
    QueryDef("ann_lsh_topk", None) { (s, d) =>
      val nBits = 4
      val nTables = 6
      val e = emb(s, d)
      // corpus side: one (table, bucket) row per table per vector.
      val corpus = e.select(col("vec_id"), col("embedding"),
        explode(array((0 until nTables).map(tb =>
          struct(lit(tb).as("tb"),
            lsh_bucket(col("embedding"), 100L + tb, nBits).as("bucket"))): _*)).as("cb"))
        .select(col("vec_id"), col("embedding"), col("cb.tb").as("tb"), col("cb.bucket").as("bucket"))
      // query side: own bucket + every 1-bit-flipped bucket, per table.
      val masks = 0 +: (0 until nBits).map(1 << _)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          explode(array((for (tb <- 0 until nTables; m <- masks) yield
            struct(lit(tb).as("tb"),
              lsh_bucket(col("embedding"), 100L + tb, nBits).bitwiseXOR(m).as("probe"))): _*)).as("qb"))
        .select(col("qid"), col("qe"), col("qb.tb").as("qtb"), col("qb.probe").as("probe"))
      // distinct() collapses the same (probe, candidate) pair found by
      // several tables BEFORE ranking (hash exchange over all 32
      // partitions — balanced, unlike the old per-probe window sort)
      rankTopK(corpus.join(broadcast(q),
          col("tb") === col("qtb") && col("bucket") === col("probe") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), cosine_sim(col("qe"), col("embedding")).as("cos"))
        .distinct(), K)
    },

    // PCA projection audit — dimensionality reduction as a first-class
    // pipeline op (smaller vectors → cheaper ANN; drift dashboards watch
    // the spectrum). Split like every trained operator here: the d×d
    // eigenproblem solves on the DRIVER over the bounded sample
    // (graft.operators.Pca — deterministic power iteration), the corpus
    // pays one linear codegen'd projection pass (R dot products per row
    // against literal eigenvectors; the mean-centering folds into a
    // constant offset per component, so the scan never materializes
    // centered vectors). Output is the per-component distributed
    // variance next to the driver's eigenvalue — on a corpus the sample
    // covers they must agree, which is the differential the spec gates
    // (plus orthonormality and a decreasing spectrum). Approximate /
    // seed-free but not SQL-expressible → rows-only driver check.
    QueryDef("emb_pca_project", None) { (s, d) =>
      import graft.operators.Pca
      val nComp = Ivf.intConf(s, "spark.graft.pca.components", 8)
      val trainSample = Ivf.intConf(s, "spark.graft.ivf.trainSample", 2000)
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val sample = e.orderBy(xxhash64(col("vec_id"))).limit(trainSample)
        .collect().map(_.getSeq[Float](1).toArray)
      val (mean, cov) = Pca.meanCov(sample)
      val (vals, vecs) = Pca.topComponents(cov, nComp)
      val projCols = (0 until nComp).map { r =>
        val offset = (0 until mean.length).map(j => mean(j) * vecs(r)(j)).sum
        (dot_product(col("embedding"), typedLit(vecs(r).map(_.toFloat))) - offset).as(s"y$r")
      }
      val aggs = (0 until nComp).flatMap { r =>
        Seq(sum(col(s"y$r")).as(s"s$r"), sum(col(s"y$r") * col(s"y$r")).as(s"ss$r"))
      }
      val one = e.select(col("vec_id") +: projCols: _*)
        .agg(count(lit(1)).as("n"), aggs: _*)
      one.select(col("n"), posexplode(array((0 until nComp).map { r =>
          struct(
            floor((col(s"ss$r") / col("n") - (col(s"s$r") / col("n")) * (col(s"s$r") / col("n")))
              * 1000000).cast("long").as("var_micro"),
            lit(math.floor(vals(r) * 1000000).toLong).as("eigen_micro"))
        }: _*)).as(Seq("component", "st")))
        .select(col("component"), col("n").as("n_vecs"),
          col("st.var_micro"), col("st.eigen_micro"))
        .orderBy(col("component"))
    },

    // Centroid-grouped similarity stats (IVF-style coarse quantization over
    // LSH buckets): per-bucket counts + mean pairwise proximity proxy —
    // the bucket-size histogram an IVF index build would produce.
    QueryDef("ann_bucket_stats", None) { (s, d) =>
      emb(s, d)
        .select(lsh_bucket(col("embedding"), 7L, 6).as("bucket"), col("label"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_vecs"), countDistinct(col("label")).as("n_labels"))
        .orderBy(col("bucket"))
    },

    // IVF-flat ANN: a spherical k-means coarse quantizer (trained with a
    // few distributed Lloyd passes over a deterministic hash-min sample),
    // corpus vectors assigned to their nearest centroid — the inverted
    // lists — and each probe vector searching only its nProbe nearest
    // lists with exact cosine. 100 TB shape: training touches a bounded
    // sample (TakeOrdered by hash, per-partition heaps — no full sort);
    // the corpus pays ONE linear codegen'd assignment pass (k dot
    // products per row against broadcast-literal centroids); the search
    // join shuffles only probed-list candidates. Approximate → rows-only
    // driver check; recall vs brute force in ApproxSuiteSpec + GATES
    // (both SFs AND a 4x-replica corpus step, so recall decay with corpus
    // growth is caught an octave before it crosses a bound).
    QueryDef("ann_ivf_topk", None) { (s, d) =>
      // SCALE-HONEST index geometry (round-13 verdict: fixed knobs sat
      // recall exactly ON the sf0.1 bound, the same decay-with-corpus
      // mechanism the PQ gate caught an octave earlier). Unless pinned by
      // conf, kClusters tracks sqrt(corpus) — the standard IVF rule, one
      // metadata-only count() — and nProbe keeps scanned-list coverage at
      // spark.graft.ivf.coverage (default 0.375: the driver fixture's
      // embeddings have WEAK cosine structure, so recall ~tracks coverage
      // and 0.375 measures ~0.65-0.82 across SFs with headroom over the
      // 0.6 gate; clustered corpora — the ApproxSuiteSpec cone fixture,
      // real embeddings — hit >= 0.8 recall at a tenth the coverage, and
      // a deployment lowers the conf accordingly).
      val (k, np) = ivfGeometry(s, d, "spark.graft.ivf.kClusters",
        "spark.graft.ivf.nProbe", kOfN = n => math.max(10,
          math.round(math.sqrt(n.toDouble)).toInt))
      ivfSearch(s, d, kClusters = k, nProbe = np)
    },

    // The same IVF pipeline at index-scale k (kClusters ~ 2·sqrt(corpus)):
    // past spark.graft.ivf.joinAssignThreshold the corpus assignment runs
    // join-shaped (broadcast centroids DataFrame + max(struct) argmax)
    // instead of a k-term literal expression that would defeat codegen.
    // Forced-path row-parity vs the literal path is spec-gated
    // (ApproxSuiteSpec); same auto-scaled geometry/coverage rule as
    // ann_ivf_topk, at double the cluster count.
    QueryDef("ann_ivf_bigk", None) { (s, d) =>
      val (k, np) = ivfGeometry(s, d, "spark.graft.ivf.bigk.kClusters",
        "spark.graft.ivf.bigk.nProbe", kOfN = n => math.max(64,
          2 * math.round(math.sqrt(n.toDouble)).toInt))
      ivfSearch(s, d, kClusters = k, nProbe = np)
    },

    // Product-quantized ANN — the memory-compression leg of the ANN
    // triad (LSH prunes candidates, IVF prunes lists, PQ shrinks BYTES:
    // at m=8, k=32 each vector's 256 B become 8 B of codes, 32× less
    // scan IO). Codebooks train on the bounded driver sample; the corpus
    // pays one linear codegen'd ENCODE pass (m×k small dot products per
    // row against literal centroids), and scoring is asymmetric (ADC):
    // approx cos(q, x) = Σ_m dot(q_m, c_m[code_m]) / (|q|·√Σ_m|c_m[code_m]|²)
    // — the query side exact, the corpus side reconstructed from codes.
    // Two stages, per the standard PQ playbook: the ADC pass scans codes
    // and keeps a per-query SHORTLIST (top `spark.graft.pq.shortlist`,
    // default 100 — codes alone cannot rank within a tight cluster where
    // members quantize identically), then a REFINE pass re-ranks only
    // the shortlist with exact cosine — a broadcast join fetching
    // |queries|·shortlist vectors, invariant of corpus size. In this
    // single query encode and search fuse into one pass (the scan reads
    // the vectors to encode them anyway); a deployment persists the
    // codes table once per corpus snapshot, and every subsequent search
    // scans ONLY codes + point-fetches the shortlist. The centroid
    // "table lookup" is element_at into literal arrays, fully inside
    // codegen. Approximate → rows-only driver check; recall vs brute
    // force gated in ApproxSuiteSpec (both fixtures).
    QueryDef("ann_pq_topk", None) { (s, d) =>
      // k=32 codes/subquantizer (5 bits; codes stay 1 B each here): halves
      // the quantization error of k=16 and holds recall@10 across the
      // fixture scales (0.94 @ sf0.01, 0.82 @ sf0.1 at shortlist 100 —
      // k=16 decayed to 0.58 at sf0.1, where 4× more competitors share
      // each ADC cell). k=64 is out of reach for the literal-array
      // codegen (Janino method-size blowup).
      val kCodes = Ivf.intConf(s, "spark.graft.pq.codes", 32)
      val subDim = Ivf.intConf(s, "spark.graft.pq.subDim", 8)
      val iters = Ivf.intConf(s, "spark.graft.ivf.iters", 3)
      val trainSample = Ivf.intConf(s, "spark.graft.ivf.trainSample", 2000)
      val shortK = Ivf.intConf(s, "spark.graft.pq.shortlist", 100)
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val sample: Array[Array[Float]] = e.orderBy(xxhash64(col("vec_id"))).limit(trainSample)
        .collect().map(_.getSeq[Float](1).toArray)
      val dim = sample.head.length
      val books = Pq.train(sample, dim / subDim, kCodes, iters)
      // encode + search fuse into one pass here (the scan reads vectors to
      // encode them anyway); a deployment persists Pq.encode's output once
      // per snapshot (IndexStore) and searches over codes alone — the
      // persisted variant is proven row-identical in IndexPersistenceSpec
      pqSearch(Pq.encode(e, books, subDim), e, books, subDim, shortK)
    },

    // Per-label embedding audit — the "did an ingest batch corrupt this
    // label's vectors" check a pipeline runs before indexing: vector
    // count, dimensionality spread (min==max proves a uniform dim), and
    // squared-norm profile (sum/min/max). Norm drift (a label whose
    // vectors stopped being unit-ish) is the classic symptom of a wrong
    // encoder version. Hash-stability: the squared norm reuses
    // dd_embed_cosine's exact fold (same left-to-right IEEE sum on both
    // engines), then floor-scales to micro units as BIGINT — grouped sums
    // are integer-exact, no float summation order anywhere. One linear
    // codegen pass + one tiny groupBy on label.
    QueryDef("emb_label_stats", Some(
      """SELECT label, count(*) AS n_vecs,
        |  min(len(embedding)) AS dim_min, max(len(embedding)) AS dim_max,
        |  CAST(sum(nsq6) AS BIGINT) AS sqnorm_sum_u,
        |  min(nsq6) AS sqnorm_min_u, max(nsq6) AS sqnorm_max_u
        |FROM (
        |  SELECT label, embedding,
        |    CAST(floor(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)) * 1e6) AS BIGINT) AS nsq6
        |  FROM embeddings)
        |GROUP BY label ORDER BY label""".stripMargin)) { (s, d) =>
      // empty (zero-element) embeddings: DuckDB's list_sum([]) is NULL and
      // its aggregates skip it; dot_product([]...) is 0.0 — null out the
      // empty case so both engines skip the same rows (n_vecs still counts
      // them, dim_min exposes them as 0)
      val nsq6 = when(size(col("embedding")) === 0, lit(null))
        .otherwise(floor(dot_product(col("embedding"), col("embedding")) * 1e6))
        .cast("long")
      emb(s, d)
        .select(col("label"), size(col("embedding")).cast("long").as("dim"), nsq6.as("nsq6"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          min(col("dim")).as("dim_min"), max(col("dim")).as("dim_max"),
          sum(col("nsq6")).as("sqnorm_sum_u"),
          min(col("nsq6")).as("sqnorm_min_u"), max(col("nsq6")).as("sqnorm_max_u"))
        .orderBy(col("label"))
    },

    // kNN label classification — the weak-labeling / label-audit pass a
    // training pipeline runs over an embedded corpus: predict each probe
    // vector's label as the majority vote of its 10 cosine-nearest
    // neighbors, then compare to the stored label. Same broadcast-probe
    // single-pass shape as ann_brute_topk (the corpus never shuffles;
    // scale-out is linear across executors), followed by two O(probes)
    // aggregations. Hash-stability: cosine is used only to ORDER
    // neighbors (tie-break vec_id, the ann_brute_topk contract); the
    // emitted columns are all integers (votes, labels, correctness flag).
    // Vote ties break toward the smaller label on both engines.
    QueryDef("emb_knn_classify", Some(
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS qlabel
         |           FROM embeddings WHERE vec_id < $NClassify),
         |  c AS (SELECT q.qid, q.qlabel, e.label, e.vec_id,
         |    list_sum(list_transform(list_zip(q.qe, e.embedding), x -> CAST(x[1] AS DOUBLE) * x[2]))
         |      / sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * x))
         |           * list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x))) AS cos
         |  FROM q, embeddings e WHERE e.vec_id <> q.qid),
         |  nn AS (SELECT qid, qlabel, label FROM (
         |    SELECT qid, qlabel, label,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
         |    FROM c) WHERE rank <= $K),
         |  v AS (SELECT qid, any_value(qlabel) AS true_label, label, count(*) AS votes
         |        FROM nn GROUP BY qid, label)
         |SELECT qid, true_label, label AS pred_label, votes,
         |  CASE WHEN label = true_label THEN 1 ELSE 0 END AS correct
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label) AS r
         |      FROM v) WHERE r = 1
         |ORDER BY qid""".stripMargin)) { (s, d) =>
      val e = emb(s, d).select(col("vec_id"), col("embedding"), col("label"),
        dot_product(col("embedding"), col("embedding")).as("nsq"))
      val q = e.filter(col("vec_id") < NClassify)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("label").as("qlabel"), col("nsq").as("qn"))
      // neighbor top-K via the bounded-heap aggregate (same shape as
      // rankTopK, with the neighbor's label and the probe's true label
      // riding along as payload fields — (cos, vec_id) stays the total
      // ordering, so the extra fields never influence rank)
      val nn = e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("qlabel"), col("label"), col("vec_id"),
          (dot_product(col("qe"), col("embedding")) / sqrt(col("qn") * col("nsq"))).as("cos"))
        .groupBy(col("qid"))
        .agg(topk_min(struct((-col("cos")).as("nc"), col("vec_id").as("vec_id"),
          col("label").as("label"), col("qlabel").as("qlabel")), K).as("tk"))
        .select(col("qid"), explode(col("tk")).as("st"))
        .select(col("qid"), col("st.label").as("label"), col("st.qlabel").as("qlabel"))
      // majority vote: argmax by (votes desc, label asc) — max_by over a
      // (votes, -label) ordering struct, no per-probe window needed
      nn.groupBy(col("qid"), col("label"))
        // qlabel is functionally determined by qid — first() is exact here
        .agg(first(col("qlabel")).as("true_label"), count(lit(1)).as("votes"))
        .groupBy(col("qid"))
        .agg(max_by(
          struct(col("true_label"), col("label").as("pred_label"), col("votes")),
          struct(col("votes"), (-col("label")).as("nl"))).as("w"))
        .select(col("qid"), col("w.true_label").as("true_label"),
          col("w.pred_label").as("pred_label"), col("w.votes").as("votes"),
          when(col("w.pred_label") === col("w.true_label"), 1).otherwise(0).as("correct"))
        .orderBy(col("qid"))
    },

    // Scalar int8 quantization — the embedding-STORAGE compression op
    // (4x smaller vectors, the simple sibling of PQ's 32x): per-vector
    // symmetric scale = 127/max|x|, q_i = floor(x_i · scale), plus the
    // reconstruction-error mass the quality gate thresholds on. One
    // linear codegen pass, zero shuffles (the ORDER BY is oracle
    // determinism only) — at 100 TB this is a map over the corpus
    // writing the compressed column next to the original. Cross-engine
    // determinism: float→double widening is exact, scale is one
    // correctly-rounded division, floor kills the ulp sensitivity round
    // ties would have, and the error sum is the same sequential
    // double-accumulator fold in both engines, floor-discretized to
    // micros on output. A zero vector (max|x| = 0) quantizes to all
    // zeros with zero error rather than dividing by zero.
    QueryDef("emb_int8_quantize", Some(
      """WITH s AS (SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |  FROM embeddings),
        |q AS (SELECT vec_id, embedding,
        |    CASE WHEN mx = 0 THEN 0.0 ELSE 127.0 / mx END AS scale
        |  FROM s)
        |SELECT vec_id,
        |  CAST(list_sum(list_transform(embedding,
        |    x -> floor(CAST(x AS DOUBLE) * scale))) AS BIGINT) AS q_sum,
        |  CAST(list_min(list_transform(embedding,
        |    x -> floor(CAST(x AS DOUBLE) * scale))) AS BIGINT) AS q_min,
        |  CAST(list_max(list_transform(embedding,
        |    x -> floor(CAST(x AS DOUBLE) * scale))) AS BIGINT) AS q_max,
        |  CAST(CASE WHEN scale = 0 THEN 0 ELSE floor(1000000 *
        |    list_sum(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) * scale) / scale))))
        |  END AS BIGINT) AS abs_err_micro
        |FROM q ORDER BY vec_id""".stripMargin)) { (s, d) =>
      val x = (c: org.apache.spark.sql.Column) => c.cast("double")
      val mx = array_max(transform(col("embedding"), e => abs(x(e))))
      val scale = when(mx === 0, lit(0.0)).otherwise(lit(127.0) / mx)
      val qArr = transform(col("embedding"), e => floor(x(e) * col("scale")))
      val err = aggregate(col("embedding"), lit(0.0),
        (acc, e) => acc + abs(x(e) - floor(x(e) * col("scale")) / col("scale")))
      emb(s, d)
        .select(col("vec_id"), col("embedding"), scale.as("scale"))
        .select(col("vec_id"),
          aggregate(qArr, lit(0.0), (a, v) => a + v).cast("long").as("q_sum"),
          array_min(qArr).cast("long").as("q_min"),
          array_max(qArr).cast("long").as("q_max"),
          when(col("scale") === 0, lit(0L))
            .otherwise(floor(lit(1000000) * err).cast("long")).as("abs_err_micro"))
        .orderBy(col("vec_id"))
    },

    // Per-class centroids — the class-prototype computation behind
    // nearest-centroid classifiers, SemDeDup cluster summaries, and
    // drift monitoring. Float summation across rows is order-dependent
    // (a cluster's reduce order is nondeterministic), so each element
    // is first floor-scaled to an integer (×2²⁰ — exact: float→double
    // widening, power-of-two multiply, floor) and the per-(label,
    // dimension) SUM is integer arithmetic — bit-identical on any
    // partitioning, any cluster size, any engine. Output is the long
    // form (label, dim, sum_u, n): one posexplode + one partial+final
    // aggregate on |labels|×dim keys; the centroid itself is
    // sum_u/n/2²⁰ at the consumer's precision of choice.
    QueryDef("emb_centroids", Some(
      """SELECT label, u.i - 1 AS dim,
        |  CAST(sum(CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1048576) AS BIGINT)) AS BIGINT) AS sum_u,
        |  count(*) AS n
        |FROM embeddings, unnest(generate_series(1, len(embedding))) u(i)
        |GROUP BY label, u.i ORDER BY label, dim""".stripMargin)) { (s, d) =>
      emb(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("label"), col("dim"),
          floor(col("x").cast("double") * 1048576).cast("long").as("xu"))
        .groupBy(col("label"), col("dim"))
        .agg(sum(col("xu")).as("sum_u"), count(lit(1)).as("n"))
        .select(col("label"), col("dim").cast("long").as("dim"),
          col("sum_u"), col("n"))
        .orderBy(col("label"), col("dim"))
    },

    // Margin-based bitext mining (Artetxe & Schwenk 2019, public
    // literature): align each "source-language" vector (even vec_id) with
    // its best "target-language" candidate (odd vec_id) by MARGIN score —
    // cosine normalized by the mean cosine of each side's k nearest
    // neighbors — with a mutual-best flag; raw cosine alone over-selects
    // hub vectors, the margin ratio is the published fix. This is the
    // parallel-corpus mining step of multilingual training pipelines.
    // Exact baseline behind QuadraticGuard (the pair frame is |A|×|B|);
    // the 100 TB path swaps the exact pair frame for an ANN shortlist
    // (ann_ivf_topk's IVF assignment) and everything downstream — the
    // per-side neighborhood sums, margin, and mutual-argmax — is already
    // the scale-safe shape: partial+final `topk_min` bounded heaps (no
    // windows), |A|- and |B|-row sum frames broadcast back, argmax via a
    // second bounded heap. Cross-engine determinism: the fused
    // dot/sqrt(na*nb) cosine is the proven dd_embed_cosine form; the
    // neighborhood sum folds the top-k cosines in the SAME order both
    // engines (cos DESC, id ASC); the margin is one division of
    // bit-identical doubles, floor-discretized to micros on output; rank
    // ties break by id. Zero-norm vectors (cos = NaN) are filtered on
    // both sides up front — the topk_min NaN contract (scaladoc) makes
    // that the caller's job.
    QueryDef("emb_bitext_mine", Some(
      """WITH e AS (SELECT vec_id, embedding,
        |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)) AS nsq
        |  FROM embeddings),
        |f AS (SELECT * FROM e WHERE nsq > 0),
        |a AS (SELECT vec_id AS va, embedding AS ea, nsq AS na FROM f WHERE vec_id % 2 = 0),
        |b AS (SELECT vec_id AS vb, embedding AS eb, nsq AS nb FROM f WHERE vec_id % 2 = 1),
        |p AS (SELECT va, vb,
        |    list_sum(list_transform(list_zip(ea, eb), x -> CAST(x[1] AS DOUBLE) * x[2]))
        |      / sqrt(na * nb) AS cos
        |  FROM a, b),
        |ka AS (SELECT va, list_sum((list(cos ORDER BY cos DESC, vb ASC))[1:4]) AS sa
        |  FROM p GROUP BY va),
        |kb AS (SELECT vb, list_sum((list(cos ORDER BY cos DESC, va ASC))[1:4]) AS sb
        |  FROM p GROUP BY vb),
        |m AS (SELECT p.va, p.vb, p.cos / ((ka.sa + kb.sb) / 8.0) AS margin
        |  FROM p JOIN ka USING (va) JOIN kb USING (vb)
        |  WHERE (ka.sa + kb.sb) / 8.0 > 0),
        |fwd AS (SELECT va, vb, margin FROM
        |  (SELECT va, vb, margin,
        |     row_number() OVER (PARTITION BY va ORDER BY margin DESC, vb ASC) AS r FROM m)
        |  WHERE r = 1),
        |bwd AS (SELECT va, vb FROM
        |  (SELECT va, vb,
        |     row_number() OVER (PARTITION BY vb ORDER BY margin DESC, va ASC) AS r FROM m)
        |  WHERE r = 1)
        |SELECT fw.va AS vec_a, fw.vb AS vec_b,
        |  CAST(floor(1000000 * fw.margin) AS BIGINT) AS margin_micro,
        |  CASE WHEN bw.va IS NOT NULL THEN 1 ELSE 0 END AS mutual
        |FROM fwd fw LEFT JOIN bwd bw ON fw.va = bw.va AND fw.vb = bw.vb
        |ORDER BY vec_a""".stripMargin)) { (s, d) =>
      val k = 4
      val e = graft.operators.QuadraticGuard
        .check(emb(s, d), "emb_bitext_mine", "ann_ivf_topk")
        .select(col("vec_id"), col("embedding"),
          dot_product(col("embedding"), col("embedding")).as("nsq"))
        .filter(col("nsq") > 0)
      // the fixture parquet is one row group → one scan partition, which
      // would run the whole |A|×|B| cosine pass as a single task; spread
      // the streamed side across the executor slots (scale-adaptive:
      // defaultParallelism, not a constant) so the broadcast-NL join's
      // per-pair work parallelizes (guide §2.6 — idle capacity)
      val a = graft.operators.Spread.toCores(e.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("va"), col("embedding").as("ea"), col("nsq").as("na")))
      val b = e.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("vb"), col("embedding").as("eb"), col("nsq").as("nb"))
      val p = a.join(b, col("va") =!= col("vb"))
        .select(col("va"), col("vb"),
          (dot_product(col("ea"), col("eb")) / sqrt(col("na") * col("nb"))).as("cos"))
      Bitext.align(p, k)
    },

    // The SCALE PATH emb_bitext_mine's scaladoc promises, realized: the
    // same margin/mutual-best alignment with the exact |A|×|B| pair frame
    // replaced by an IVF candidate shortlist — the shared k-means
    // quantizer multi-assigns each source vector to its nAssign nearest
    // clusters (boundary-pair recovery, the dd_semdedup dual) and
    // single-assigns targets, so pair work is bounded per cluster and the
    // total stays linear with kClusters tracking corpus size. Each (a,b)
    // candidate appears EXACTLY once (b has one cluster; matched iff it
    // lies in a's nAssign set), so no dedup pass. Downstream is the
    // identical Bitext.align stage — bounded heaps, broadcast sums — now
    // fed neighborhood sums over candidates (the standard ANN
    // approximation of the kNN normalizer). k-means is init-dependent →
    // rows-only driver check; alignment agreement vs the exact baseline
    // is gated in ApproxSuiteSpec.
    QueryDef("emb_bitext_ann", None) { (s, d) =>
      val k = 4
      val kClusters = Ivf.intConf(s, "spark.graft.ivf.kClusters", 10)
      val iters = Ivf.intConf(s, "spark.graft.ivf.iters", 3)
      val trainSample = Ivf.intConf(s, "spark.graft.ivf.trainSample", 2000)
      val nAssign = Ivf.intConf(s, "spark.graft.bitext.nAssign", 3)
      val e = emb(s, d)
        .select(col("vec_id"), col("embedding"),
          dot_product(col("embedding"), col("embedding")).as("nsq"))
        .filter(col("nsq") > 0)
      val cents = Ivf.train(e.select(col("vec_id"), col("embedding")),
        kClusters, iters, trainSample)
      val a = e.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("va"), col("embedding").as("ea"), col("nsq").as("na"))
      val b = e.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("vb"), col("embedding").as("eb"), col("nsq").as("nb"))
      val asgA = Ivf.multiAssigned(
        a.select(col("va").as("vec_id"), col("ea").as("embedding")), cents, nAssign)
        .select(col("vec_id").as("va"), col("cl"))
      val asgB = Ivf.assigned(
        b.select(col("vb").as("vec_id"), col("eb").as("embedding")), cents)
        .select(col("vec_id").as("vb"), col("cl"))
      val p = asgA.join(asgB, Seq("cl"))
        .join(a, Seq("va")).join(b, Seq("vb"))
        .select(col("va"), col("vb"),
          (dot_product(col("ea"), col("eb")) / sqrt(col("na") * col("nb"))).as("cos"))
      Bitext.align(p, k)
    },

    // Embedding GENERATION through the model-inference seam
    // (operators/BatchInfer): one mapPartitions pass, kernel loaded by
    // classname config once per task, fed fixed-size batches — the
    // run-an-encoder-over-100-TB plumbing, exercised here with the
    // deterministic built-in (16-dim hashed bag-of-words, the
    // fn_feature_hash function at width 16) so the generated vectors are
    // oracle-checkable: l1 mass = token count, each slot = its bucket's
    // token count. Batch-boundary invariance and the classname seam are
    // spec-gated (BatchInferSpec); a real deployment swaps
    // spark.graft.infer.class for the actual encoder runtime.
    QueryDef("emb_generate", Some(
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
        |b AS (SELECT doc_id,
        |   ((strpos('0123456789abcdef', substr(md5(t),1,1))-1)*4096
        |   +(strpos('0123456789abcdef', substr(md5(t),2,1))-1)*256
        |   +(strpos('0123456789abcdef', substr(md5(t),3,1))-1)*16
        |   +(strpos('0123456789abcdef', substr(md5(t),4,1))-1)) % 16 AS bucket
        | FROM tok)
        |SELECT doc_id, 16 AS dim,
        |  count(*) AS l1,
        |  count(*) FILTER (WHERE bucket = 0) AS s0,
        |  count(*) FILTER (WHERE bucket = 7) AS s7
        |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin)) { (s, d) =>
      // spread the one-task fixture scan before the CPU-heavy embed pass
      // (profiled: two ~0.65 s single-task jobs — the orderBy's range
      // sampling evaluates the embed projection a second time)
      val out = graft.operators.BatchInfer.embed(
        graft.operators.Spread.toCores(
          Tables.load(s, d, "documents").select(col("doc_id"), col("text"))),
        "text", "emb")
      out.select(col("doc_id"),
          size(col("emb")).as("dim"),
          aggregate(col("emb"), lit(0L), (acc, x) => acc + x.cast("long")).as("l1"),
          element_at(col("emb"), 1).cast("long").as("s0"),
          element_at(col("emb"), 8).cast("long").as("s7"))
        .orderBy(col("doc_id"))
    }
  )
}

/** The margin/mutual-best alignment stage shared by the exact and ANN
  * bitext miners: per-side top-k neighborhood sums (bounded heaps,
  * deterministic (cos DESC, id ASC) fold order), margin = cos / mean of
  * the two neighborhood means, forward argmax per source, mutual flag
  * from the backward argmax. All aggregates partial+final; the sum and
  * argmax frames broadcast back. */
private[queries] object Bitext {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import graft.functions.topk_min

  def align(p: DataFrame, k: Int): DataFrame = {
    // The pair frame is consumed FOUR times downstream (ka, kb, and the
    // margin frame feeding both argmax passes) — without a cut each
    // consumer re-ran the full pair cosine scan, which profiling showed
    // as 4 serial repeats of the single most expensive job in the query
    // (guide §5: localCheckpoint to stop recomputing a reused
    // intermediate). The pair frame is |A|·|candidates| rows of three
    // scalars — output-sized, in-model to hold.
    val pm = p.localCheckpoint(true)
    // neighborhood sum: fold the heap's sorted (cos DESC, id ASC) order —
    // the exact order the oracle's list(...)[1:k] slice sums in
    val sumTk = (tk: Column) =>
      aggregate(tk, lit(0.0), (acc, x) => acc + (-x.getField("nc")))
    val ka = pm.groupBy(col("va"))
      .agg(topk_min(struct((-col("cos")).as("nc"), col("vb").as("id")), k).as("tk"))
      .select(col("va"), sumTk(col("tk")).as("sa"))
    val kb = pm.groupBy(col("vb"))
      .agg(topk_min(struct((-col("cos")).as("nc"), col("va").as("id")), k).as("tk"))
      .select(col("vb"), sumTk(col("tk")).as("sb"))
    val m = pm.join(broadcast(ka), Seq("va")).join(broadcast(kb), Seq("vb"))
      .select(col("va"), col("vb"), col("cos"),
        ((col("sa") + col("sb")) / lit(2.0 * k)).as("denom"))
      .filter(col("denom") > 0)
      .select(col("va"), col("vb"), (col("cos") / col("denom")).as("margin"))
    val fwd = m.groupBy(col("va"))
      .agg(topk_min(struct((-col("margin")).as("nm"), col("vb").as("vb")), 1).as("tk"))
      .select(col("va"), element_at(col("tk"), 1).as("w"))
      .select(col("va"), col("w.vb").as("vb"), (-col("w.nm")).as("margin"))
    val bwd = m.groupBy(col("vb"))
      .agg(topk_min(struct((-col("margin")).as("nm"), col("va").as("va")), 1).as("tk"))
      .select(col("vb"), element_at(col("tk"), 1).getField("va").as("va"),
        lit(1).as("is_mutual"))
    fwd.join(broadcast(bwd), Seq("va", "vb"), "left")
      .select(col("va").as("vec_a"), col("vb").as("vec_b"),
        floor(lit(1000000) * col("margin")).cast("long").as("margin_micro"),
        coalesce(col("is_mutual"), lit(0)).as("mutual"))
      .orderBy(col("vec_a"))
  }
}
