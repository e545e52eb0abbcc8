package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.{Dedup, Multimodal, Pipelines, ScaleOps, Similarity}

/** Training-data pipeline operators: dedup family, similarity search,
  * text analysis, multimodal plumbing. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docsData = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different content about spark engines"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "short text")
  )
  private def docs = docsData.toDF("doc_id", "text")

  test("exactDedup keeps lowest id per content") {
    val out = Dedup.exactDedup(docs, "doc_id", Seq("text"))
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(0L, 1L, 2L, 4L))
  }

  test("exactDedup does not collide concat-ambiguous or NULL-vs-empty rows") {
    val d = Seq(
      (1L, Some("ab"), Some("")), (2L, Some("a"), Some("b")),
      (3L, Some("x"), None), (4L, None, Some("x")), (5L, Some("x"), Some(""))
    ).toDF("id", "c1", "c2")
    val survivors = Dedup.exactDedup(d, "id", Seq("c1", "c2")).count()
    assert(survivors == 5) // all rows distinct — none may be dropped
  }

  test("wordShingles: k-grams, short docs empty") {
    val sh = docs.select(TextFns.wordShingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0).head == "the quick brown" && sh(0).length == 7)
    assert(sh(4).isEmpty) // 2 tokens < k=3 → empty, not sequence(1,0)
  }

  test("minHashDupPairs finds the planted near-dup and not the unrelated doc") {
    val pairs = Dedup.minHashDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)) || pairs.contains((0L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L })
    // exact dup pair has jaccard 1.0
    val exact = Dedup.minHashDupPairs(docs, "doc_id", "text", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.contains((0L, 3L)))
  }

  test("dupClusters maps members to min representative") {
    val pairs = Seq((0L, 1L, 1.0), (0L, 3L, 1.0)).toDF("id_a", "id_b", "jaccard")
    val cl = Dedup.dupClusters(pairs).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(cl == Seq((1L, 0L), (3L, 0L)))
  }

  test("dupClustersClosure reaches transitive fixpoint on a chain") {
    // chain 1-2, 2-3, 3-4 plus isolated pair 10-11
    val pairs = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0), (10L, 11L, 1.0))
      .toDF("id_a", "id_b", "jaccard")
    val cl = Dedup.dupClustersClosure(pairs).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(cl == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("dupClustersClosure pointer jumping handles a diameter-63 chain in few rounds") {
    // localEdgeLimit = 0 forces the DISTRIBUTED path (small inputs
    // normally take the driver-side union-find); pure neighbor
    // propagation would need ~diameter rounds, pointer jumping
    // converges well inside maxIter = 8
    val chain = (1L until 64L).map(i => (i, i + 1, 1.0))
    val cl = Dedup.dupClustersClosure(
        chain.toDF("id_a", "id_b", "jaccard"), maxIter = 8, localEdgeLimit = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cl.length == 64 && cl.forall(_._2 == 1L))
    // and the union-find fast path agrees exactly
    val local = Dedup.dupClustersClosure(chain.toDF("id_a", "id_b", "jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(local.sorted.toSeq == cl.sorted.toSeq)
  }

  test("band-skew auto salting: probe detects the hot band, pair set identical to unsalted") {
    // 30 IDENTICAL boilerplate docs → identical shingle sets → every
    // band key carries all 30 (the n² hot-band case the salting splits)
    val boiler = "subscribe to our newsletter for the latest updates and offers today"
    val corpus = ((1 to 30).map(i => (i.toLong, boiler)) ++ Seq(
      (100L, "the quick brown fox jumps over the lazy dog and runs away"),
      (101L, "a completely different document about spark engines and data")
    )).toDF("doc_id", "text")
    val unsalted = Dedup.minHashDupPairs(corpus, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = Dedup.minHashDupPairs(corpus, "doc_id", "text", threshold = 0.5,
        saltBuckets = 0, autoSaltThreshold = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == unsalted)
    assert(unsalted.contains((1L, 2L))) // the boilerplate cluster is really there
    // the probe decision itself
    val skewed = ((1 to 100).map(i => ("hot", i)) ++ Seq(("cold", 1))).toDF("band", "x")
    assert(ScaleOps.autoSaltBuckets(skewed, "band", hotKeyThreshold = 10L) == 10)
    assert(ScaleOps.autoSaltBuckets(skewed, "band", hotKeyThreshold = 1000L) == 1)
    assert(ScaleOps.autoSaltBuckets(skewed, "band", hotKeyThreshold = 1L, maxBuckets = 16) == 16)
    assert(ScaleOps.autoSaltBuckets(skewed.limit(0), "band") == 1) // empty → no salt
  }

  test("dupClustersClosure keeps string ids and their type on both paths") {
    // string doc ids are valid all the way through minHashDupPairs, so
    // the clustering must not coerce them; both paths must produce the
    // SAME schema and values. "Z10" < "z2" in UTF-8 byte order (what
    // Spark's min uses) even though a naive numeric read would disagree.
    val pairs = Seq(("z2", "Z10", 1.0), ("Z10", "a5", 1.0))
      .toDF("id_a", "id_b", "jaccard")
    val local = Dedup.dupClustersClosure(pairs)
    assert(local.schema("id").dataType == org.apache.spark.sql.types.StringType)
    val l = local.orderBy("id").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val dist = Dedup.dupClustersClosure(pairs, localEdgeLimit = 0L)
      .orderBy("id").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(l == dist)
    assert(l.forall(_._2 == "Z10")) // min by binary UTF-8 order: 'Z'(0x5A) < 'a'(0x61) < 'z'(0x7A)
  }

  test("dupClustersClosure rejects an out-of-range localEdgeLimit") {
    val pairs = Seq((1L, 2L, 1.0)).toDF("id_a", "id_b", "jaccard")
    intercept[IllegalArgumentException] {
      Dedup.dupClustersClosure(pairs, localEdgeLimit = Int.MaxValue.toLong)
    }
  }

  test("simHash: identical docs same sig; near-dups close in hamming") {
    val sigs = docs.select(col("doc_id"), Dedup.simHash(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(1L)) < ham(sigs(0L), sigs(2L)))
    val pairs = Dedup.simHashDupPairs(docs, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 3L)))
  }

  test("native SimHash64 equals the HOF formulation bit-for-bit (both hash modes)") {
    val d = spark.read.parquet(s"$sf001/documents.parquet")
    val xx = d.select(
      TextFns.simHash(col("text"), 64, portable = false).as("fast"),
      Dedup.simHashFromHashes(
        transform(TextFns.tokens(col("text")), t => xxhash64(t)), 64).as("slow"))
    assert(xx.filter(col("fast") =!= col("slow")).count() == 0)
    val pm = d.select(
      TextFns.simHash(col("text"), 60, portable = true).as("fast"),
      Dedup.simHashFromHashes(
        transform(TextFns.tokens(col("text")), t => TextFns.portableHash(t)), 60).as("slow"))
    assert(pm.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("cosine similarity exact values") {
    val d = Seq((1L, Seq(1f, 0f), 0), (2L, Seq(0f, 1f), 0), (3L, Seq(1f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val sims = Similarity.topKByCosine(d, "embedding", Seq(1f, 0f), 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sims(1L) == 1.0)
    assert(sims(2L) == 0.0)
    assert(math.abs(sims(3L) - 0.707107) < 1e-6)
  }

  test("MaxSim late interaction: per-query-token best match sums; empty docs excluded") {
    val d = Seq(
      // doc 1: a token aligned with each query token → 1 + 1 = 2
      (1L, Seq(Seq(1f, 0f), Seq(0f, 1f))),
      // doc 2: only the first query token matches; best for q2 is 0
      (2L, Seq(Seq(1f, 0f), Seq(1f, 0f))),
      // doc 3: diagonal token serves both at cos 0.707107
      (3L, Seq(Seq(1f, 1f))),
      (4L, Seq.empty[Seq[Float]]) // no tokens → excluded
    ).toDF("vec_id", "tok_vecs")
    val got = Similarity.maxSimTopK(
        d, "tok_vecs", Seq(Seq(1f, 0f), Seq(0f, 1f)), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == 2.0)
    assert(got(2L) == 1.0)
    assert(math.abs(got(3L) - 1.414214) < 1e-6)
    // ranking: doc 1 first (sum of bests beats single best)
    val order = Similarity.maxSimTopK(
        d, "tok_vecs", Seq(Seq(1f, 0f), Seq(0f, 1f)), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(order == Seq(1L, 3L))
    // a ZERO-padded token (the standard fixed-length layout) must score
    // 0, not NaN-poison the ranking to the top
    val padded = Seq(
      (1L, Seq(Seq(0f, 0f), Seq(0.1f, 0.1f))), // zero pad + diagonal token
      (2L, Seq(Seq(1f, 0f)))                    // aligned token
    ).toDF("vec_id", "tok_vecs")
    val top = Similarity.maxSimTopK(padded, "tok_vecs", Seq(Seq(1f, 0f)), 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top.map(_._1) == Seq(2L, 1L)) // zero token did NOT rank doc 1 first
    assert(top(0)._2 == 1.0 && math.abs(top(1)._2 - 0.707107) < 1e-6)
  }

  test("int8 quantization: values, scale, zero-vector guard, range") {
    val d = Seq(
      (1L, Seq(1f, -2f, 4f), 0),          // maxabs 4 → q = (32, -64, 127)
      (2L, Seq(0f, 0f, 0f), 0)            // all-zero → q = 0s, scale 0
    ).toDF("vec_id", "embedding", "label")
    val q = Similarity.quantizeInt8(d, "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getSeq[Byte](3), r.getAs[Double]("qscale")))).toMap
    assert(q(1L)._1 == Seq[Byte](32, -64, 127))
    assert(q(1L)._2 == 4.0 / 127.0)
    assert(q(2L)._1 == Seq[Byte](0, 0, 0))
    assert(q(2L)._2 == 0.0)
    // every quantized component of the fixture is within int8 range
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val bad = Similarity.quantizeInt8(e, "embedding")
      .select(explode(col("qvec")).as("q"))
      .filter(col("q") > 127 || col("q") < -127)
    assert(bad.count() == 0)
  }

  test("quantized dot ranking tracks exact cosine on the fixture (top-1)") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = Similarity.quantizeInt8(e, "embedding")
    val qq = q.filter(col("vec_id") === 0L).select("qvec").first().getSeq[Byte](0)
    val topQ = Similarity.topKByQuantizedDot(q, "qvec", qq, 3).collect()
    // the query itself must rank first under its own quantized dot
    assert(topQ.head.getLong(0) == 0L)
    // reconstruction-space cosine of the query with itself is 1.0
    val self = q.filter(col("vec_id") === 0L)
      .select(Similarity.quantizedCosine(col("qvec"), col("qvec")))
      .first().getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("LSH ann: same-direction vectors share buckets; topK reranks exactly") {
    val base = Seq(1f, 2f, 3f, 4f)
    val d = Seq(
      (1L, base, 0),
      (2L, base.map(_ * 2f), 0),            // same direction → same bucket, sim 1.0
      (3L, base.map(x => -x), 0)            // opposite → complementary bucket
    ).toDF("vec_id", "embedding", "label")
    val lsh = Similarity.RandomHyperplaneLsh(dim = 4, numPlanes = 8)
    val indexed = lsh.index(d, "embedding")
    val b = indexed.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    assert(b(1L) == b(2L))
    assert(b(1L) != b(3L))
    val top = lsh.annTopK(indexed, "embedding", base, 2).collect()
    assert(top.head.getDouble(1) == 1.0)
  }

  test("ann on fixture: recall vs brute force at small k") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0L).select("embedding").first().getSeq[Float](0)
    val brute = Similarity.topKByCosine(e, "embedding", q, 5)
      .collect().map(_.getLong(0)).toSet
    val lsh = Similarity.RandomHyperplaneLsh(dim = 64, numPlanes = 8)
    val ann = lsh.annTopK(lsh.index(e, "embedding"), "embedding", q, 5)
      .collect().map(_.getLong(0)).toSet
    // the query vector itself must always be found (sim 1.0, same bucket)
    assert(ann.contains(0L))
    assert(brute.contains(0L))
  }

  test("native CosineSimilarity expression agrees with HOF formulation bit-for-bit") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val both = e.select(
      Similarity.cosine(col("embedding"), Similarity.vecLit(Seq.fill(64)(0.5f))).as("fast"),
      Similarity.cosineHof(col("embedding"), Similarity.vecLit(Seq.fill(64)(0.5f))).as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
    // SQL registration path
    Similarity.registerSqlFunctions(spark)
    e.createOrReplaceTempView("emb_sql_test")
    val viaSql = spark.sql(
      "SELECT cosine_similarity(embedding, embedding) AS s FROM emb_sql_test LIMIT 5")
      .collect().map(_.getDouble(0))
    assert(viaSql.forall(s => math.abs(s - 1.0) < 1e-12))
  }

  test("native DotProduct agrees with HOF formulation bit-for-bit; LSH bucket identical") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val w = Similarity.vecLit(Seq.tabulate(64)(i => (i - 32) / 17.0f))
    val both = e.select(
      Similarity.dot(col("embedding"), w).as("fast"),
      Similarity.dotHof(col("embedding"), w).as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
    // the codegen'd bucket path must produce the exact same bucket ids
    // as the interpreted formulation (sign decisions preserved)
    val lsh = Similarity.RandomHyperplaneLsh(dim = 64, numPlanes = 12)
    val buckets = e.select(
      lsh.bucket(col("embedding")).as("fast"),
      lsh.bucketHof(col("embedding")).as("slow"))
    assert(buckets.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("cosine/dot propagate NULL array elements as NULL") {
    val d = Seq(
      (1L, Seq[Option[Float]](Some(1f), None, Some(3f))),
      (2L, Seq[Option[Float]](Some(1f), Some(2f), Some(3f)))
    ).toDF("id", "emb")
    val out = d.select(col("id"),
        Similarity.dot(col("emb"), Similarity.vecLit(Seq(1f, 1f, 1f))).as("dp"),
        Similarity.cosine(col("emb"), Similarity.vecLit(Seq(1f, 1f, 1f))).as("cs"))
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(out(1L) == ((true, true)))
    assert(out(2L) == ((false, false)))
  }

  test("hashedWordShingles native expression equals HOF formulation as a set") {
    val hof = docs.select(col("doc_id"),
      array_sort(array_distinct(transform(
        TextFns.wordShingles(col("text"), 3), s => TextFns.portableHash(s)))).as("h"))
    val native = docs.select(col("doc_id"),
      array_sort(TextFns.hashedWordShingles(col("text"), 3)).as("h"))
    val joined = hof.alias("a").join(native.alias("b"), "doc_id")
      .filter(org.apache.spark.sql.functions.expr("a.h IS DISTINCT FROM b.h"))
    assert(joined.count() == 0)
  }

  test("embeddingNearDupPairs (banded) finds self-similar pairs without a cross join") {
    val base = Seq.tabulate(8)(i => i.toFloat + 1f)
    val d = Seq(
      (1L, base), (2L, base.map(_ * 3f)), // same direction: sim 1.0, same buckets
      (3L, base.map(x => -x)), (4L, base.reverse.map(_ * 0.5f))
    ).toDF("vec_id", "embedding")
    val lsh = Similarity.RandomHyperplaneLsh(dim = 8, numPlanes = 12)
    // Materialize.None keeps the full lazy plan visible for the
    // no-cross-join assertion (checkpointing would truncate it)
    val pairs = Similarity.embeddingNearDupPairs(
      d, "vec_id", "embedding", 0.99, lsh, bands = 4,
      materialize = Dedup.Materialize.None)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    assert(!got.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("pairCapPerBucket splits dense buckets; identical signatures always survive") {
    // 40 vectors in the same direction (identical 12-bit signature —
    // one maximally dense bucket per band) + noise directions
    val base = Seq.tabulate(8)(i => i.toFloat + 1f)
    val rnd = new scala.util.Random(7)
    val dense = (1L to 40L).map(i =>
      (i, base.map(x => x * (1f + i * 1e-4f))))
    val noise = (100L to 120L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
    val d = (dense ++ noise).toDF("vec_id", "embedding")
    val lsh = Similarity.RandomHyperplaneLsh(dim = 8, numPlanes = 12)
    def pairsWith(cap: Long) = Similarity.embeddingNearDupPairs(
        d, "vec_id", "embedding", 0.99, lsh, bands = 4,
        materialize = Dedup.Materialize.None, pairCapPerBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairsWith(Long.MaxValue >> 10)
    val capped = pairsWith(4L) // every dense bucket far over the cap
    // the cap only removes candidates, never invents them
    assert(capped.subsetOf(uncapped))
    // the sub-key is carved from the FULL signature, so a pair whose
    // entire signature agrees shares every sub-bucket at any k —
    // exact/near-exact duplicates are immune to the cap
    val densePairs = for (a <- 1L to 40L; b <- (a + 1) to 40L) yield (a, b)
    assert(densePairs.forall(capped.contains),
      "identical-signature near-dups must survive the second-level split")
    // capBound saturates instead of overflowing
    assert(Similarity.capBound(Long.MaxValue / 2, 3) == Long.MaxValue)
    assert(Similarity.capBound(512L, 3) == 4096L)
  }

  test("semanticDedup keeps one representative per embedding cluster") {
    val base = Seq.tabulate(8)(i => i.toFloat + 1f)
    val other = Seq.tabulate(8)(i => if (i % 2 == 0) 1f else -1f)
    val d = Seq(
      (1L, base), (2L, base.map(_ * 2f)), (5L, base.map(_ * 0.5f)), // cluster {1,2,5}
      (3L, other), (7L, other.map(_ * 4f)),                         // cluster {3,7}
      (9L, base.map(x => -x))                                       // alone
    ).toDF("vec_id", "embedding")
    val lsh = Similarity.RandomHyperplaneLsh(dim = 8, numPlanes = 12)
    val kept = Pipelines.semanticDedup(
        d, "vec_id", "embedding", threshold = 0.99, lsh = lsh, bands = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 9L))
    // RepPolicy.Best: keep the highest-norm member instead (ties → min id)
    val norm = (df: org.apache.spark.sql.DataFrame) =>
      aggregate(df.col("embedding"), lit(0d), (a, x) => a + x * x)
    val best = Pipelines.semanticDedup(
        d, "vec_id", "embedding", threshold = 0.99, lsh = lsh, bands = 4,
        repPolicy = Pipelines.RepPolicy.Best(norm))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(best == Set(2L, 7L, 9L))
  }

  test("IVF index: query vector found via nearest-cell probe") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0L).select("embedding").first().getSeq[Float](0)
    val idx = Similarity.ivfIndex(e, "embedding", k = 8)
    assert(idx.centers.length == 8)
    val top = Similarity.ivfTopK(idx, "embedding", q, k = 5, nprobe = 2)
      .collect()
    assert(top.map(_.getLong(0)).contains(0L)) // own cell always probed first
    assert(top.head.getDouble(1) == 1.0)
    assert(idx.indexed.count() == e.count())
    // a 2-of-8-cell probe scans a strict subset of the corpus
    val probedRows = idx.indexed.groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(probedRows.size == 8 && probedRows.values.sum == e.count())
  }

  test("language id picks marker-heavy language") {
    val d = Seq(
      (1L, "the cat and the dog of the house is big"),
      (2L, "el perro de la casa que ladra"),
      (3L, "xyzzy qwerty")).toDF("id", "text")
    val out = d.select(col("id"), TextFns.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en" && out(2L) == "es" && out(3L) == "und")
  }

  test("quality score ranges and components") {
    val d = Seq(
      (1L, "a clean readable sentence with normal words here"),
      (2L, "@@@@ ### !!!! ^^^^ %%%%")).toDF("id", "text")
    val out = d.select(col("id"),
        TextFns.qualityScore(col("text")).as("q"),
        TextFns.punctRatio(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L)._1 > out(2L)._1)
    assert(out(2L)._2 > 0.5)
    assert(out.values.forall { case (q, _) => q >= 0.0 && q <= 1.0 })
  }

  test("real image decode: BMP and PPM/PGM parse to exact pixel statistics") {
    def bmp24(w: Int, h: Int, pixelsBgr: Array[(Int, Int, Int)], topDown: Boolean = false): Array[Byte] = {
      val stride = ((w * 3 + 3) / 4) * 4
      val out = new Array[Byte](54 + stride * h)
      def le32(off: Int, v: Int): Unit = (0 until 4).foreach(k => out(off + k) = ((v >> (8 * k)) & 0xff).toByte)
      def le16(off: Int, v: Int): Unit = (0 until 2).foreach(k => out(off + k) = ((v >> (8 * k)) & 0xff).toByte)
      out(0) = 'B'; out(1) = 'M'
      le32(2, out.length); le32(10, 54); le32(14, 40)
      le32(18, w); le32(22, if (topDown) -h else h)
      le16(26, 1); le16(28, 24); le32(30, 0)
      pixelsBgr.zipWithIndex.foreach { case ((bb, gg, rr), i) =>
        val o = 54 + (i / w) * stride + (i % w) * 3
        out(o) = bb.toByte; out(o + 1) = gg.toByte; out(o + 2) = rr.toByte
      }
      out
    }
    // four gray pixels 255/0/100/50 → mean luminance 101.25
    val grays = Array((255, 255, 255), (0, 0, 0), (100, 100, 100), (50, 50, 50))
    val ppm = "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++
      grays.flatMap { case (a, b, c) => Seq(a.toByte, b.toByte, c.toByte) }
    val pgm = "P5\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](255.toByte, 0, 100, 50)
    val rows = Seq(
      (1L, bmp24(2, 2, grays)),
      (2L, bmp24(2, 2, grays, topDown = true)),
      (3L, ppm),
      (4L, pgm),
      (5L, "not an image at all".getBytes("UTF-8")))
    val d = rows.toDF("id", "media")
      .select(col("id"), Multimodal.decodeFeatures(col("media")).as("f"))
      .select(col("id"), col("f.format"), col("f.width"), col("f.height"), col("f.brightness"))
      .orderBy("id").collect()
    assert(d(0).getString(1) == "bmp" && d(0).getLong(2) == 2 && d(0).getLong(3) == 2
      && d(0).getDouble(4) == 101.25)
    assert(d(1).getDouble(4) == 101.25) // top-down BMP decodes identically
    assert(d(2).getString(1) == "ppm" && d(2).getDouble(4) == 101.25)
    assert(d(3).getString(1) == "pgm" && d(3).getDouble(4) == 101.25)
    assert(d(4).isNullAt(1)) // unsupported bytes → NULL, not garbage
  }

  test("real codec decode: PNG exact roundtrip, JPEG within codec tolerance") {
    import graft.plans.ImageCodec
    // lossless PNG: gray-valued RGB pixels decode back bit-exactly
    val png = ImageCodec.grayPng(3, 2, (x, y) => 40 + 10 * (y * 3 + x))
    // constant-color JPEG: minimal codec loss, w/h always exact
    val jimg = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8) jimg.setRGB(x, y, 0x646464) // gray 100
    val jbaos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(jimg, "jpeg", jbaos)
    val rows = Seq(
      (1L, png),
      (2L, jbaos.toByteArray),
      (3L, png.take(20)), // truncated PNG → decode failure → NULL
      (4L, Array.fill[Byte](64)(0x41))) // junk → NULL
    val d = rows.toDF("id", "media")
      .select(col("id"), Multimodal.decodeFeatures(col("media")).as("f"))
      .select(col("id"), col("f.format"), col("f.width"), col("f.height"), col("f.brightness"))
      .orderBy("id").collect()
    // PNG: pixels 40,50,60,70,80,90 → mean 65.0 exactly
    assert(d(0).getString(1) == "png" && d(0).getLong(2) == 3 && d(0).getLong(3) == 2
      && d(0).getDouble(4) == 65.0)
    assert(d(1).getString(1) == "jpeg" && d(1).getLong(2) == 8 && d(1).getLong(3) == 4
      && math.abs(d(1).getDouble(4) - 100.0) < 8.0)
    assert(d(2).isNullAt(1))
    assert(d(3).isNullAt(1))
    // batchProcess takes the same codec path
    val batch = Multimodal.batchProcess(
        Multimodal.packMedia(rows.toDF("doc_id", "payload"), "doc_id", "payload", "image"))
      .orderBy("media_id").collect()
    assert(batch(0).getString(2) == "png" && batch(0).getDouble(5) == 65.0)
    assert(batch(2).isNullAt(2) && batch(2).getLong(1) == 20L)
  }

  test("crafted BMP header with overflowing dimensions decodes to NULL, not a crash") {
    // w = 2^30 − 1 so w*4 overflows Int; Long stride math must reject it
    val b = new Array[Byte](128)
    b(0) = 'B'; b(1) = 'M'
    def le32(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    le32(10, 54) // data offset
    le32(18, (1 << 30) - 1) // width
    le32(22, Int.MinValue) // height: abs(Int.MinValue) trap
    b(28) = 32 // bpp
    le32(30, 0) // BI_RGB
    val d = Seq((1L, b)).toDF("id", "media")
      .select(Multimodal.decodeFeatures(col("media")).as("f"))
      .select(col("f.format")).collect()
    assert(d(0).isNullAt(0))
  }

  test("redactPii masks emails, IPs, phones; clean text untouched") {
    val d = Seq(
      (1L, "reach me at john.doe+spam@mail.example.org today"),
      (2L, "server at 192.168.001.250 rebooted"),
      (3L, "call +44 (0) 7911 123456 now"),
      (4L, "no pii here just words")
    ).toDF("id", "t")
    val out = d.select(col("id"), TextFns.redactPii(col("t")).as("r"))
      .orderBy("id").collect().map(_.getString(1))
    assert(out(0) == "reach me at [EMAIL] today")
    assert(out(1) == "server at [IP] rebooted")
    assert(out(2) == "call [PHONE] now")
    assert(out(3) == "no pii here just words")
  }

  test("termDocFreq counts documents, not occurrences") {
    val d = Seq((1L, "spark spark is fast"), (2L, "spark is neat")).toDF("id", "t")
    val m = TextFns.termDocFreq(d, "t").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("spark" -> 2L, "is" -> 2L, "fast" -> 1L, "neat" -> 1L))
  }

  test("tfidfTopTerms ranks doc-specific terms above corpus-wide ones") {
    val d = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry date")).toDF("id", "t")
    val top1 = TextFns.tfidfTopTerms(d, "id", "t", k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: apple tf=2 df=1 → 2*(4/2)=4.0 beats banana 1*(4/3);
    // doc 2: banana and cherry tie at 4/3 → term asc picks "banana";
    // doc 3: cherry tf=3 df=2 → 3*(4/3)=4.0 beats date 1*(4/2)=2.0
    assert(top1 == Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
  }

  test("bm25TopK matches the hand-computed rational-idf score") {
    val d = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry date")).toDF("id", "t")
    // N=3, T=9; term "apple": df=1; doc 1 tf=2, dl=3:
    //   P = 22*2*9*(6-2+1) = 1980, Q = 3*(180+27+81) = 864
    //   C = 1980/864 = 2.2916_6 -> round-half-up 6dp = 2.291667
    // (classic form check: idf = 2.5/1.5, tf-part = 4.4/3.2 -> same)
    val rows = TextFns.bm25TopK(d, "id", "t", Seq("apple"), k = 3).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 1L)
    assert(rows(0).getDouble(1) == 2.291667)
  }

  test("bm25TopK normalizes by document length; ranks multi-term matches") {
    val d = Seq(
      (1L, "banana kiwi kiwi"),
      (2L, "banana kiwi"),
      (3L, "melon melon melon")).toDF("id", "t")
    // same tf=1 of 'banana' in docs 1 and 2 -> shorter doc 2 wins
    val one = TextFns.bm25TopK(d, "id", "t", Seq("banana"), k = 2).collect()
    assert(one.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    assert(one(0).getDouble(1) > one(1).getDouble(1))
    // two-term query: only matching docs rank; doc 1's kiwi tf=2
    // outweighs doc 2's shorter length — per-term micro-units
    // round(528/925 *1e6)=570811, round(1056/1325 *1e6)=796981 for
    // doc 1 vs 2*round(528/790 *1e6)=1336708 for doc 2; melon-only
    // doc 3 is absent
    val two = TextFns.bm25TopK(d, "id", "t", Seq("banana", "kiwi"), k = 3).collect()
    assert(two.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(two(0).getDouble(1) == 1.367792 && two(1).getDouble(1) == 1.336708)
  }

  test("bm25TopK plan: no term shuffle, top-k without a global sort") {
    val d = spark.read.parquet(s"$sf001/documents.parquet")
    val plan = TextFns.bm25TopK(d, "doc_id", "text", Seq("spark", "merge"), k = 10)
      .queryExecution.executedPlan.toString
    // the only exchanges are the one-row stats aggregate (single
    // partition) and its broadcast back — scoring never explodes terms
    assert(!plan.contains("Exchange hashpartitioning"))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("linearTextScore: mean pooling, bias, missing buckets weigh zero") {
    val docs = Seq((1L, "alpha alpha alpha"), (2L, "beta"), (3L, ""))
      .toDF("id", "t")
    // constant-weight model: every bucket 500000 micro -> logit is
    // exactly 0.5 + bias for ANY non-empty doc (mean pooling collapses)
    val const = spark.range(256).select(
      col("id").cast("int").as("bucket"), lit(500000L).as("weight_micro"))
    val out = TextFns.linearTextScore(docs, "t", const, 256, biasMicro = 250000L)
      .orderBy("id").collect()
    assert(out(0).getDouble(out(0).fieldIndex("logit")) == 0.75)
    assert(out(1).getDouble(out(1).fieldIndex("logit")) == 0.75)
    assert(out(2).isNullAt(out(2).fieldIndex("logit"))) // empty: no evidence
    // empty model: every bucket missing -> weighs 0, logit == bias
    val empty = spark.range(0).select(
      col("id").cast("int").as("bucket"), col("id").as("weight_micro"))
    val out2 = TextFns.linearTextScore(docs, "t", empty, 256, biasMicro = 250000L)
      .orderBy("id").collect()
    assert(out2(0).getDouble(out2(0).fieldIndex("logit")) == 0.25)
  }

  test("filterByLinearScore: exact >= threshold, empty docs kept") {
    val docs = Seq((1L, "alpha beta"), (2L, "")).toDF("id", "t")
    val const = spark.range(256).select(
      col("id").cast("int").as("bucket"), lit(500000L).as("weight_micro"))
    // logit is exactly 0.5; threshold at 0.5 keeps (>=), just above drops
    def kept(thresh: Long) =
      TextFns.filterByLinearScore(docs, "t", const, 256, minLogitMicro = thresh)
        .collect().map(_.getLong(0)).toSet
    assert(kept(500000L) == Set(1L, 2L))
    assert(kept(500001L) == Set(2L)) // empty doc kept: no evidence
  }

  test("linearTextScore plan: no explode, no join, no shuffle in scoring") {
    val docs = Seq((1L, "alpha beta")).toDF("id", "t")
    val w = spark.range(8).select(
      col("id").cast("int").as("bucket"), lit(1L).as("weight_micro"))
    val plan = TextFns.linearTextScore(docs, "t", w, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"))
    assert(!plan.contains("Generate")) // no explode
  }

  test("ingestIncrement: in-batch dedup, cross-batch dedup, hash uniqueness") {
    import graft.operators.Pipelines
    import graft.sources.DeltaScan
    val base = java.nio.file.Files.createTempDirectory("graft_ingest").toString + "/c"
    // batch 1 carries an internal duplicate (ids 10/11 same text)
    val b1 = Seq((10L, "alpha"), (11L, "alpha"), (12L, "beta")).toDF("id", "t")
    val first = Pipelines.ingestIncrement(spark, base, b1, "id", "t")
    assert(first.count() == 2) // alpha (min id 10) + beta
    assert(DeltaScan.read(spark, base).count() == 2)
    // re-ingesting the same content appends nothing
    val again = Pipelines.ingestIncrement(spark, base, b1, "id", "t")
    assert(again.count() == 0)
    assert(DeltaScan.read(spark, base).count() == 2)
    // only genuinely new content survives a mixed batch
    val b2 = Seq((20L, "alpha"), (21L, "gamma")).toDF("id", "t")
    val third = Pipelines.ingestIncrement(spark, base, b2, "id", "t")
    assert(third.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((21L, "gamma")))
    val all = DeltaScan.read(spark, base).collect()
    assert(all.length == 3)
    // invariant: content_hash unique across the table, min-id survivors
    val byHash = all.map(r => r.getAs[String]("content_hash")).toSet
    assert(byHash.size == 3)
    assert(all.map(_.getAs[Long]("id")).toSet == Set(10L, 12L, 21L))
    // the membership probe reads ONE pruned column of the corpus table
    val probe = DeltaScan.read(spark, base).select("content_hash")
      .queryExecution.executedPlan.toString
    assert(probe.contains("ReadSchema: struct<content_hash:string>"))
  }

  test("cleanCorpus keeps one representative per near-dup cluster, drops junk") {
    import graft.operators.Pipelines
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      (2L, "the quick brown fox jumps over the lazy dog and runs far away house"), // near-dup of 1
      (3L, "the quick brown fox jumps over the lazy dog and runs far away home"), // exact dup of 1
      (4L, "el perro de la casa que ladra mucho en la noche durante la semana"),  // not en
      (5L, "@@@@ #### !!!! %%%% ^^^^ &&&& **** (((( )))) @@@@ #### !!!!"),        // junk quality
      (6L, "a completely different and is of the sentence about spark engines and the data processing")
    ).toDF("doc_id", "text")
    val out = Pipelines.cleanCorpus(corpus, "doc_id", "text",
        minQuality = 0.3, langs = Seq("en"), jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 6L)) // 2 clustered into 1, 3 exact-dup'd, 4 lang, 5 junk
  }

  test("cleanCorpus RepPolicy.Best keeps the highest-quality cluster member, not the lowest id") {
    import graft.operators.Pipelines
    // doc 2 is a near-dup of doc 1 but LONGER → higher length-driven
    // quality score; MinId keeps 1, Best must keep 2
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      (2L, "the quick brown fox jumps over the lazy dog and runs far away home tonight again"),
      (3L, "a completely different and is of the sentence about spark engines and the data processing")
    ).toDF("doc_id", "text")
    val minId = Pipelines.cleanCorpus(corpus, "doc_id", "text",
        minQuality = 0.3, langs = Seq("en"), jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(minId == Set(1L, 3L))
    val best = Pipelines.cleanCorpus(corpus, "doc_id", "text",
        minQuality = 0.3, langs = Seq("en"), jaccardThreshold = 0.5,
        repPolicy = Pipelines.RepPolicy.Best(df => TextFns.qualityScore(df.col("text"))))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(best == Set(2L, 3L))
  }

  test("multimodal plumbing: pack → decode stub → batchProcess") {
    val media = Multimodal.packMedia(docs, "doc_id", "text", "text/plain")
    assert(media.columns.toSeq == Seq("media_id", "media", "meta"))
    assert(media.schema("media").dataType.typeName == "binary")
    val decoded = media.withColumn("d", Multimodal.decodeFeaturesStub(col("media")))
      .select("media_id", "d.width", "d.height", "d.brightness").collect()
    assert(decoded.forall(r => r.getLong(1) >= 16 && r.getLong(1) < 4112))
    // determinism: same payload → same features
    val again = Multimodal.packMedia(docs, "doc_id", "text", "text/plain")
      .withColumn("d", Multimodal.decodeFeaturesStub(col("media")))
      .select("media_id", "d.width").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(decoded.forall(r => again(r.getLong(0)) == r.getLong(1)))
    val processed = Multimodal.batchProcess(media).collect()
    assert(processed.length == docsData.length)
    assert(processed.forall(_.getLong(1) > 0))
    assert(processed.forall(_.isNullAt(2))) // text payloads: no image format
    val frames = media.select(Multimodal.frameSampleStub(col("media"), 3).as("f")).first().getSeq[String](0)
    assert(frames.length == 3 && frames.distinct.length == 3)
  }
  test("dropRepeatedParagraphs: boilerplate out, structure + originals intact") {
    val docs = Seq(
      (1L, "COOKIE\nreal text one\n\nunique tail"),
      (2L, "COOKIE\nreal text two"),
      (3L, "COOKIE\n  COOKIE  \nreal text three"), // trimmed match + padding
      (4L, "COOKIE")                                 // all boilerplate
    ).toDF("doc_id", "text")
    val out = Dedup.dropRepeatedParagraphs(docs, "doc_id", "text", minRepeats = 3)
      .orderBy("doc_id").collect()
    // COOKIE appears 5x trimmed -> dropped everywhere (incl. padded form)
    assert(out(0).getString(1) == "real text one\n\nunique tail") // empty line kept
    assert(out(1).getString(1) == "real text two")
    assert(out(2).getString(1) == "real text three")
    assert(out(3).getString(1) == "") // every paragraph was boilerplate
    assert(out(0).getLong(2) == 4 && out(0).getLong(3) == 1) // n_paragraphs, n_dropped
    assert(out(2).getLong(3) == 2)
    assert(out(3).getLong(3) == 1)
    // below the threshold nothing is touched
    val loose = Dedup.dropRepeatedParagraphs(docs, "doc_id", "text", minRepeats = 6)
      .orderBy("doc_id").collect()
    assert(loose.map(_.getString(1)).toSeq == docs.orderBy("doc_id").collect().map(_.getString(1)).toSeq)
  }

  test("frequentTerms: exact under capacity, MG bound under pressure, merge-safe") {
    import graft.functions.TextFns
    // distinct terms <= k: estimates are EXACT counts regardless of partitioning
    val small = Seq("a a b", "b a c", "c c c d").toDF("text").repartition(4)
    val ex = small.agg(TextFns.frequentTerms(col("text"), 16).as("sk"))
      .select(explode(col("sk")).as("e"))
      .collect().map(r => r.getStruct(0).getString(0) -> r.getStruct(0).getLong(1)).toMap
    assert(ex == Map("a" -> 3L, "b" -> 2L, "c" -> 4L, "d" -> 1L))
    // adversarial: 60 distinct fillers interleaved with a heavy term,
    // k = 8 << distinct -> constant decrement pressure.
    // "heavy" count = 60 + 60 + 3 = 123; each filler 2; n = 243 tokens.
    val heavy = (0 until 60).map(i => s"heavy filler$i").mkString(" ")
    val docs = Seq(heavy, heavy, "heavy heavy heavy").toDF("text").repartition(5)
    val n = 60 * 2 * 2 + 3 // tokens total
    val sk = docs.agg(TextFns.frequentTerms(col("text"), 8).as("sk"))
      .select(explode(col("sk")).as("e"))
      .collect().map(r => r.getStruct(0).getString(0) -> r.getStruct(0).getLong(1)).toMap
    val truth = Map("heavy" -> 123L) ++ (0 until 60).map(i => s"filler$i" -> 2L)
    // est <= true and est >= true - n/(k+1) for every reported term
    sk.foreach { case (t, est) =>
      assert(est <= truth(t), s"$t overestimated: $est > ${truth(t)}")
      assert(est * 9 >= truth(t) * 9 - n, s"$t below MG bound")
    }
    // the heavy term (63 > n/9 = 27) MUST be present
    assert(sk.contains("heavy"))
    // SQL surface
    graft.GraftExtensions.register(spark)
    small.createOrReplaceTempView("ft_docs")
    val viaSql = spark.sql(
      "SELECT frequent_terms(text, 16) AS sk FROM ft_docs")
      .select(explode(col("sk")).as("e"))
      .collect().map(r => r.getStruct(0).getString(0) -> r.getStruct(0).getLong(1)).toMap
    assert(viaSql == ex)
  }

  test("dropRepeatedSpans: repeated k-grams out, overlaps merge, short docs pass") {
    val docs = Seq(
      (1L, "all rights reserved worldwide alpha beta gamma"),
      (2L, "all rights reserved worldwide delta"),
      (3L, "prefix all rights reserved worldwide suffix"),
      (4L, "tiny doc"),                                   // < k tokens: untouched
      (5L, "unrelated content entirely here today")
    ).toDF("doc_id", "text")
    // "all rights reserved worldwide" (k=4) occurs 3x -> stripped everywhere
    val out = Dedup.dropRepeatedSpans(docs, "doc_id", "text", k = 4, minRepeats = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "alpha beta gamma")
    assert(out(1).getString(1) == "delta")
    assert(out(2).getString(1) == "prefix suffix")
    assert(out(3).getString(1) == "tiny doc")
    assert(out(4).getString(1) == "unrelated content entirely here today")
    assert(out(0).getLong(2) == 7 && out(0).getLong(3) == 4) // n_tokens, n_dropped
    assert(out(3).getLong(3) == 0)
    // overlapping repeated grams union their positions instead of
    // double-dropping: with k=2 and "x y x y x y" the grams (x y),
    // (y x) all repeat -> every token covered exactly once
    val over = Seq((1L, "x y x y x y"), (2L, "x y x y x y")).toDF("doc_id", "text")
    val o = Dedup.dropRepeatedSpans(over, "doc_id", "text", k = 2, minRepeats = 2)
      .orderBy("doc_id").collect()
    assert(o.forall(_.getString(1) == ""))
    assert(o.forall(r => r.getLong(2) == 6 && r.getLong(3) == 6))
    // below the threshold nothing changes (normalization aside)
    val loose = Dedup.dropRepeatedSpans(docs, "doc_id", "text", k = 4, minRepeats = 4)
      .orderBy("doc_id").collect()
    assert(loose.map(_.getLong(3)).forall(_ == 0L))
  }
}
