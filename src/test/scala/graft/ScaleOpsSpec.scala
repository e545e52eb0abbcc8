package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, ScaleOps, Similarity}

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed table join on bucket keys plans without an exchange on either side") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "bv")
    ScaleOps.saveBucketed(a, "graft_bkt_a", Seq("k"), 4, Seq("k"))
    ScaleOps.saveBucketed(b, "graft_bkt_b", Seq("k"), 4, Seq("k"))
    val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), Seq("k"))
    assert(joined.count() == 1000)
    val plan = joined.queryExecution.executedPlan.toString
    // co-bucketed layout: no shuffle exchange anywhere in the join plan
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
    spark.sql("DROP TABLE graft_bkt_a"); spark.sql("DROP TABLE graft_bkt_b")
  }

  test("salted join preserves equi-join semantics") {
    // skewed large side: one hot key
    val large = ((1 to 900).map(_ => 1L) ++ (1 to 100).map(_.toLong))
      .toDF("k").withColumn("v", monotonically_increasing_id())
    val small = (1 to 100).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).count()
    val salted = ScaleOps.saltedInnerJoin(large, small, "k", buckets = 8).count()
    assert(salted == plain)
    // salt distributes the hot key across buckets
    val (l, _, _) = ScaleOps.saltedForJoin(large, small, "k", 8)
    val spread = l.filter(col("k") === 1L).select("__salt").distinct().count()
    assert(spread > 1)
  }

  test("salted minhash band join yields the identical pair set") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    def pairs(salt: Int) = Dedup.minHashDupPairs(
        docs, "doc_id", "text", threshold = 0.4, saltBuckets = salt)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(8) == pairs(1))
  }

  test("salted Hamming band join: planted hot band, identical pairs, bounded task skew") {
    // 40 IDENTICAL boilerplate docs (10% of a 400-doc corpus) → one
    // signature → every (chunk_id, chunk) band key carries all 40:
    // exactly the n² hot band real crawls produce from boilerplate
    val boiler = "click here to subscribe to our newsletter for daily updates and offers"
    val corpus = ((1 to 40).map(i => (i.toLong, boiler)) ++
      (41 to 400).map(i => (i.toLong,
        s"unique document number $i about topic ${i % 17} with extra words ${i * 31}"))
      ).toDF("doc_id", "text")
    def pairs(salt: Int) = Dedup.simHashDupPairs(
        corpus, "doc_id", "text", maxHamming = 3, saltBuckets = salt)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unsalted = pairs(1)
    // the boilerplate cluster is really there (40 choose 2 pairs at minimum)
    assert(unsalted.size >= 40 * 39 / 2)
    assert(pairs(8) == unsalted)  // manual salt: identical output
    // auto mode (threshold low enough to trigger on the 40-doc band)
    val auto = Dedup.simHashDupPairs(corpus, "doc_id", "text", maxHamming = 3,
        saltBuckets = 0, autoSaltThreshold = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == unsalted)
    val sigs = corpus.select(col("doc_id"),
      graft.functions.TextFns.simHash(col("text"), 64, portable = false).as("sig"))
    val bands = sigs.select(col("doc_id"),
      explode(array((0 until 4).map(c => struct(lit(c).as("chunk_id"),
        shiftright(col("sig"), c * 16).bitwiseAND(lit(0xffffL)).as("chunk"))): _*)).as("b"))
      .select(col("b.chunk_id"), col("b.chunk"))
    assert(ScaleOps.autoSaltBucketsKeys(bands, Seq("chunk_id", "chunk"),
      hotKeyThreshold = 10L) >= 4) // 40-doc hot band / 10 = 4 buckets
    // and the salt actually spreads the hot band across tasks
    val l = bands.withColumn("id_a", lit(0L))
    val (sl, _, _) = ScaleOps.saltedForJoinKeys(l, l, Seq("chunk_id", "chunk"), 8)
    val hotSpread = sl
      .groupBy("chunk_id", "chunk").agg(countDistinct("__salt").as("nsalt"))
      .agg(max("nsalt")).first().getLong(0)
    assert(hotSpread > 1, "hot band not spread across salt buckets")
  }

  test("recallReport: exact-vs-exact is k/k; degraded probes lose recall; integers exact") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    // the "approx" path IS brute force → recall must be exactly k/k
    val perfect = Similarity.recallReport(e, "embedding", Seq(0L, 1L, 2L), 5,
      v => Similarity.topKByCosine(e, "embedding", v, 5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(perfect.toSeq == Seq((0L, 5L, 5L), (1L, 5L, 5L), (2L, 5L, 5L)))
    // a narrower probe ring can only lose recall (subset of
    // candidates), never exceed k
    val lsh = Similarity.RandomHyperplaneLsh(dim = 64, numPlanes = 8)
    val indexed = lsh.index(e, "embedding")
    val ann = Similarity.recallReport(e, "embedding", Seq(0L, 1L, 2L), 5,
      v => lsh.annTopK(indexed, "embedding", v, 5, multiprobeRadius = 0))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ann.forall { case (_, hits) => hits >= 0L && hits <= 5L })
    // widening the probe ring can only help (candidate superset)
    val wide = Similarity.recallReport(e, "embedding", Seq(0L, 1L, 2L), 5,
      v => lsh.annTopK(indexed, "embedding", v, 5, multiprobeRadius = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    ann.foreach { case (qid, hits) => assert(wide(qid) >= hits) }
  }

  test("recallReport loop form refuses oversized query sets with a pointer at the batch form") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val msg = intercept[IllegalArgumentException] {
      Similarity.recallReport(e, "embedding", (0L until 100L), 5,
        v => Similarity.topKByCosine(e, "embedding", v, 5))
    }.getMessage
    assert(msg.contains("recallReportBatch") && msg.contains("maxQueries=64"),
      s"wrong refusal: $msg")
    // explicit override still runs (caller accepts the job storm)
    assert(Similarity.recallReport(e, "embedding", (0L until 66L), 5,
      v => Similarity.topKByCosine(e, "embedding", v, 5),
      maxQueries = 66).count() == 66L)
  }

  test("recallReportBatch: identical report to the loop form; jobs don't scale with |queries|") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val lsh = Similarity.RandomHyperplaneLsh(dim = 64, numPlanes = 8)
    val indexed = lsh.index(e, "embedding")
    def asTriples(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    // identical to the loop form at both probe radii (incl. a zero-hit-prone one)
    for (radius <- Seq(0, 2)) {
      val loop = asTriples(Similarity.recallReport(e, "embedding",
        Seq(0L, 1L, 2L, 3L, 4L), 5,
        v => lsh.annTopK(indexed, "embedding", v, 5, multiprobeRadius = radius)))
      val batch = asTriples(Similarity.recallReportBatch(e, "embedding",
        Seq(0L, 1L, 2L, 3L, 4L), 5,
        qs => lsh.annTopKAll(indexed, "embedding", qs, 5, multiprobeRadius = radius)))
      assert(batch == loop, s"radius=$radius")
    }
    // O(passes), not O(queries): job count for a 40x-larger query set
    // stays flat (the loop form would issue 2 jobs per query)
    val nIds = e.count().toInt
    def jobsFor(ids: Seq[Long]): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try {
        Similarity.recallReportBatch(e, "embedding", ids, 5,
          qs => lsh.annTopKAll(indexed, "embedding", qs, 5)).collect()
        // listener events post asynchronously: wait for the count to settle
        var last = -1; var settle = 0
        while (settle < 3 && { Thread.sleep(100); true }) {
          if (counter.get() == last) settle += 1 else { settle = 0; last = counter.get() }
        }
        counter.get()
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val small = jobsFor((0L until 5L))
    val large = jobsFor((0L until math.min(200L, nIds.toLong)))
    assert(large <= small + 2,
      s"batched recall jobs grew with query count: $small -> $large")
  }

  test("written LSH index prunes partitions on probe and reranks identically") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0L).select("embedding").first().getSeq[Float](0)
    val lsh = Similarity.RandomHyperplaneLsh(dim = 64, numPlanes = 8)
    val path = java.nio.file.Files.createTempDirectory("graft-lshidx").toString
    lsh.writeIndex(e, "embedding", path)
    val reloaded = Similarity.RandomHyperplaneLsh(dim = 64, numPlanes = 8)
      .annTopK(lsh.readIndex(spark, path), "embedding", q, 5)
    // the bucket IN (probes) filter must reach the scan as a partition
    // filter — that's the whole point of partitionBy(bucket)
    val scan = reloaded.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("bucket"),
      s"probe filter not pushed to partition pruning:\n$scan")
    val direct = lsh.annTopK(lsh.index(e, "embedding"), "embedding", q, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(reloaded.collect().map(_.getLong(0)).toSeq == direct)
  }

  test("IVF index save/load roundtrip probes the same cells") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0L).select("embedding").first().getSeq[Float](0)
    val idx = Similarity.ivfIndex(e, "embedding", k = 8)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString
    Similarity.saveIvfIndex(idx, path)
    val loaded = Similarity.loadIvfIndex(spark, path)
    assert(loaded.centers.length == 8)
    assert(loaded.centers.zip(idx.centers).forall { case (a, b) => a.sameElements(b) })
    val a = Similarity.ivfTopK(idx, "embedding", q, 5, nprobe = 2).collect().map(_.getLong(0)).toSeq
    val b = Similarity.ivfTopK(loaded, "embedding", q, 5, nprobe = 2).collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("Materialize.BucketedTable: same pairs through a bucketed-table intermediate") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val viaCache = Dedup.minHashDupPairs(docs, "doc_id", "text", threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaTable = Dedup.minHashDupPairs(docs, "doc_id", "text", threshold = 0.4,
        materialize = Dedup.Materialize.BucketedTable("graft_mh_bases", 4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaTable == viaCache)
    // the intermediate is a real bucketed table a session can reuse
    assert(spark.catalog.tableExists("graft_mh_bases"))
    spark.sql("DROP TABLE graft_mh_bases")
  }

  test("cleanCorpus materialize modes agree: Cache vs None vs BucketedTable") {
    import graft.operators.Pipelines
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    def survivors(m: Dedup.Materialize): Set[Long] =
      Pipelines.cleanCorpus(docs, "doc_id", "text",
          minQuality = 0.3, langs = Seq("en"), jaccardThreshold = 0.4,
          materialize = m)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaCache = survivors(Dedup.Materialize.Cache)
    assert(viaCache.nonEmpty)
    assert(survivors(Dedup.Materialize.None) == viaCache)
    // the 100 TB path: filtered corpus + shingle payload both land in
    // bucketed tables (nothing pinned in executor memory)
    assert(survivors(Dedup.Materialize.BucketedTable("graft_cc_filtered", 4)) == viaCache)
    assert(spark.catalog.tableExists("graft_cc_filtered"))
    assert(spark.catalog.tableExists("graft_cc_filtered__shingles"))
    spark.sql("DROP TABLE graft_cc_filtered")
    spark.sql("DROP TABLE graft_cc_filtered__shingles")
    // Cache mode must leave nothing pinned but the returned result
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = Pipelines.cleanCorpus(docs, "doc_id", "text",
      minQuality = 0.3, langs = Seq("en"), jaccardThreshold = 0.4)
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 1)
    out.unpersist(blocking = true)
  }

  test("pair finders release their intermediates (eager-result-and-release)") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val before = spark.sparkContext.getPersistentRDDs.size
    val pairs = Dedup.minHashDupPairs(docs, "doc_id", "text", threshold = 0.4)
    pairs.count()
    val after = spark.sparkContext.getPersistentRDDs.size
    // only the (small) checkpointed RESULT may remain pinned
    assert(after <= before + 1, s"leaked cached RDDs: $before -> $after")
    pairs.unpersist(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.size <= before)
  }

  test("zorderValue interleaves bits; known values") {
    import spark.implicits._
    // x=0b101 (5), y=0b011 (3), 3 bits each, n=2: bit b of x -> 2b,
    // bit b of y -> 2b+1 => z = 0b011111 = 31... compute: x bits (1,0,1),
    // y bits (1,1,0): z bits: pos0=x0=1, pos1=y0=1, pos2=x1=0, pos3=y1=1,
    // pos4=x2=1, pos5=y2=0 => 0b011011 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(ScaleOps.zorderValue(Seq(col("x"), col("y")), 3).as("z"))
      .first().getLong(0)
    assert(z == 27L)
    // single column degenerates to the masked value itself
    val z1 = Seq((13L, 0L)).toDF("x", "y")
      .select(ScaleOps.zorderValue(Seq(col("x")), 4).as("z"))
      .first().getLong(0)
    assert(z1 == 13L)
  }

  test("zorderWrite clusters BOTH dimensions (file min/max spans shrink vs lead-sort)") {
    import spark.implicits._
    // 64x64 grid; lead-column sort clusters x perfectly but leaves y
    // spanning the full domain in every file; z-order bounds both
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    def fileSpans(path: String): Seq[(Long, Long)] = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(org.apache.spark.sql.functions.max(col("x")) - org.apache.spark.sql.functions.min(col("x")),
               org.apache.spark.sql.functions.max(col("y")) - org.apache.spark.sql.functions.min(col("y"))).first()
        (r.getLong(0), r.getLong(1))
      }
    }
    val zPath = java.nio.file.Files.createTempDirectory("graft_zw").toString
    ScaleOps.zorderWrite(df, zPath, Seq(col("x"), col("y")), bitsPerCol = 6, numFiles = 16)
    val leadPath = java.nio.file.Files.createTempDirectory("graft_lead").toString
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(leadPath)
    val zs = fileSpans(zPath); val ls = fileSpans(leadPath)
    // content identical either way
    assert(spark.read.parquet(zPath).count() == 64L * 64L)
    // z-order: every file's y-span is a fraction of the domain;
    // lead-sort: y spans the whole domain in every file
    val zMaxY = zs.map(_._2).max
    val lMinY = ls.map(_._2).min
    assert(zMaxY <= 31L, s"z-order y spans: $zs")
    assert(lMinY == 63L, s"lead-sort y spans: $ls")
    // and x stays clustered too (span well under the 63 domain)
    assert(zs.map(_._1).max <= 31L, s"z-order x spans: $zs")
  }
}
