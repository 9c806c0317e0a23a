package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IndexStore
import graft.queries.{Ivf, Pq, SimilarityQueries}

/** The train-once persistence seam: trained artifacts (IVF centroids, PQ
  * codebooks + codes, PCA basis) must survive a save/load round-trip
  * BIT-EXACTLY, so a deployment that trains once per corpus snapshot and
  * searches from the persisted artifact gets row-identical results to the
  * self-contained queries the oracle gate checks. */
class IndexPersistenceSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)
  private def tmp(name: String) = s"/tmp/graft_index_spec/$name"

  private def embeddings = graft.sources.Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("IVF centroids round-trip bit-exactly; assignment from loaded centroids is identical") {
    val cents = Ivf.train(embeddings, kClusters = 10, iters = 3, trainSample = 2000)
    IndexStore.saveIvf(spark, tmp("ivf"), cents)
    val loaded = IndexStore.loadIvf(spark, tmp("ivf"))
    assert(loaded.size == cents.size)
    assert(loaded.zip(cents).forall { case (a, b) => a.sameElements(b) },
      "centroid floats must round-trip bit-exactly through parquet")
    val direct = Ivf.assigned(embeddings, cents).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val fromLoaded = Ivf.assigned(embeddings, loaded).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(direct == fromLoaded, "assignment must be identical from persisted centroids")
  }

  test("PQ search from a persisted codes table == self-contained ann_pq_topk") {
    val subDim = 8
    val e = embeddings
    val sample = e.orderBy(xxhash64(col("vec_id"))).limit(2000)
      .collect().map(_.getSeq[Float](1).toArray)
    val books = Pq.train(sample, sample.head.length / subDim, 32, 3) // = spark.graft.pq.codes default

    // persist both artifacts: codebooks and the encoded codes table
    IndexStore.savePq(spark, tmp("pq_books"), books)
    Pq.encode(e, books, subDim).write.mode("overwrite").parquet(tmp("pq_codes"))

    val loadedBooks = IndexStore.loadPq(spark, tmp("pq_books"))
    assert(loadedBooks.size == books.size &&
      loadedBooks.zip(books).forall { case (a, b) =>
        a.size == b.size && a.zip(b).forall { case (x, y) => x.sameElements(y) }
      }, "codebooks must round-trip bit-exactly")

    val codes = spark.read.parquet(tmp("pq_codes"))
    val persisted = SimilarityQueries.pqSearch(codes, e, loadedBooks, subDim, shortK = 100)
    val selfContained = SparkEntry.queries("ann_pq_topk")(spark, sfDir)
    assert(persisted.collect().toSeq == selfContained.collect().toSeq,
      "search over persisted codes must be row-identical to the self-contained query")

    // the "search reads only codes" claim, on the plan: the ADC stage's
    // file scan reads the codes parquet (c*/rn2 columns), and the only
    // embeddings reads are the broadcast probe/refine sides
    val plan = persisted.queryExecution.executedPlan.toString
    assert(plan.contains("pq_codes"), s"search must scan the persisted codes table:\n$plan")
  }

  test("streaming assignment against the persisted index == batch assignment (ss_ann_assign)") {
    // the query itself trains deterministically, persists via IndexStore,
    // RELOADS, and assigns a replayed vector stream per micro-batch; the
    // differential contract is drained ≡ batch assignment over
    // identically-trained centroids
    val drained = SparkEntry.queries("ss_ann_assign")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k = spark.conf.getOption("spark.graft.ivf.k").map(_.toInt).getOrElse(16)
    val cents = Ivf.train(embeddings, k, iters = 3, trainSample = 2000)
    val batch = Ivf.assigned(embeddings, cents).collect()
      .map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    assert(drained.size == batch.size)
    assert(drained == batch,
      "per-micro-batch assignment from the persisted quantizer must equal the batch pass")
  }

  test("maintained IVF index (ss_ivf_maintain) serves searches identical to a batch-built index, under any slicing") {
    def withConf[A](kv: (String, String)*)(body: => A): A = {
      val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    def rows(slices: String): Seq[(Long, Long, Long)] =
      withConf("spark.graft.ssjoin.slices" -> slices) {
        SparkEntry.queries("ss_ivf_maintain")(spark, sfDir)
          .select(col("qid"), col("rank").cast("long"), col("vec_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      }
    val maintained = rows("4")
    // batch counterpart: identical deterministic training, one-shot
    // assignment, the same shared serving tree
    val k = spark.conf.getOption("spark.graft.ivf.k").map(_.toInt).getOrElse(16)
    val cents = Ivf.train(embeddings, k, iters = 3, trainSample = 2000)
    val nProbe = math.max(3, math.ceil(
      spark.conf.get("spark.graft.ivf.coverage", "0.375").toDouble * k).toInt)
    val batch = SimilarityQueries.ivfProbeSearch(
      Ivf.assigned(embeddings, cents),
      embeddings.filter(col("vec_id") < SimilarityQueries.NQueries), cents, nProbe)
      .select(col("qid"), col("rank").cast("long"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(maintained == batch,
      "the maintained index must serve the batch-built index's exact results")
    assert(rows("1") == maintained, "segment layout cannot depend on slicing")
  }

  test("segment-to-list compaction preserves the postings set and serves identically") {
    val k = 10
    val cents = Ivf.train(embeddings, k, iters = 3, trainSample = 2000)
    val assigned = Ivf.assigned(embeddings, cents)
    // two ingest segments (the ss_ivf_maintain batch layout)
    val segRoot = tmp("ivf_segs")
    val listRoot = tmp("ivf_lists")
    assigned.filter(col("vec_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$segRoot/batch=0")
    assigned.filter(col("vec_id") % 2 === 1)
      .write.mode("overwrite").parquet(s"$segRoot/batch=1")
    Ivf.compactSegments(spark, segRoot, listRoot)

    def postings(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cl").cast("int")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    val lists = spark.read.parquet(listRoot)
    assert(postings(lists) == postings(assigned),
      "compaction must preserve the postings set exactly")
    // the compacted layout is the fg_ivf_delete shape: cl= directories
    val dirs = Option(new java.io.File(listRoot).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("cl=")).toSet
    assert(dirs.nonEmpty, "compaction must write cl-partitioned lists")
    // and the shared serving tree answers identically from either layout
    val nProbe = 4
    val probes = embeddings.filter(col("vec_id") < SimilarityQueries.NQueries)
    def serve(corpus: org.apache.spark.sql.DataFrame) =
      SimilarityQueries.ivfProbeSearch(corpus, probes, cents, nProbe)
        .collect().map(_.toString).toSeq
    assert(serve(spark.read.parquet(segRoot)
        .select(col("vec_id"), col("embedding"), col("cl"))) ==
      serve(lists.select(col("vec_id"), col("embedding"), col("cl"))),
      "serving must be bit-identical across layouts")
  }

  test("PCA basis round-trips bit-exactly") {
    import graft.operators.Pca
    val sample = embeddings.orderBy(xxhash64(col("vec_id"))).limit(500)
      .collect().map(_.getSeq[Float](1).toArray)
    val (mean, cov) = Pca.meanCov(sample)
    val (vals, vecs) = Pca.topComponents(cov, 4)
    IndexStore.savePca(spark, tmp("pca"), mean, vals, vecs)
    val (m2, v2, e2) = IndexStore.loadPca(spark, tmp("pca"))
    assert(m2.sameElements(mean))
    assert(v2.sameElements(vals))
    assert(e2.zip(vecs).forall { case (a, b) => a.sameElements(b) })
  }
}
