package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf, "embeddings")
  private val qids = Seq(0L, 1L, 2L, 3L, 4L)

  test("brute-force top-k: k rows per query, scores in [-1,1] descending") {
    val out = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, 10).cache()
    val byQ = out.collect().groupBy(_.getLong(0))
    assert(byQ.keySet == qids.toSet)
    byQ.values.foreach { rows =>
      assert(rows.length == 10)
      val scores = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(scores.forall(s => s >= -1.0001 && s <= 1.0001))
    }
  }

  test("int8 top-k: high overlap with exact, scores within quantization error") {
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val exactByQ = exact.groupBy(_._1._1)
    val i8 = Similarity.int8TopK(emb, "vec_id", "embedding", qids, 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val i8ByQ = i8.groupBy(_._1._1)
    assert(i8ByQ.keySet == qids.toSet)
    qids.foreach { q =>
      val e = exactByQ(q).map(_._1._2).toSet
      val a = i8ByQ(q).map(_._1._2).toSet
      assert(a.size == 10)
      // 8-bit quantization of 64-dim normalized vectors: per-element
      // relative error ≤ 1/254 — neighbor sets barely move
      assert((e intersect a).size >= 8, s"query $q: overlap ${(e intersect a).size}")
    }
    // quantized score ≈ true cosine for the common pairs
    val exactMap = exact.toMap
    i8.foreach { case (k, s) =>
      exactMap.get(k).foreach(c => assert(math.abs(s - c) <= 0.02,
        s"pair $k: int8 $s vs cosine $c"))
    }
  }

  test("LSH embedding-dup pairs: subset of exact pairs, decent recall") {
    import graft.operators.Dedup
    val exact = Dedup.embeddingDupPairs(emb, "vec_id", "embedding", tau = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingDupPairsLsh(emb, "vec_id", "embedding", tau = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // exact-cosine filter kills false positives
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.3, s"recall=$recall (exact=${exact.size})")
    }
  }

  test("IVF top-k: probed-list results rank correctly and scores match brute force") {
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", qids, 10,
      numCentroids = 16, nProbe = 3).collect()
    assert(ivf.nonEmpty)
    val byQ = ivf.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val scores = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // every candidate the IVF scores agrees with the exact cosine
    ivf.foreach { r =>
      exact.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(math.abs(c - r.getDouble(2)) < 1e-9)
      }
    }
  }

  test("IVF assignment is map-side: no Exchange between scan and argmax") {
    val plan = Similarity.ivfAssignments(emb, "vec_id", "embedding", 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"IVF assignment must stay inside the scan stage:\n$plan")
    assert(plan.contains("nearestcentroid") || plan.contains("NearestCentroid"),
      s"expected the native argmax expression in:\n$plan")
  }

  test("IVF centroid count is fixed regardless of corpus size") {
    val all = Similarity.ivfAssignments(emb, "vec_id", "embedding", 16)
    assert(all.select("cid").distinct().count() <= 16)
    // half the corpus, same K — |C| must not scale with n
    val half = Similarity.ivfAssignments(
      emb.filter(org.apache.spark.sql.functions.col("vec_id") < 250),
      "vec_id", "embedding", 16)
    assert(half.select("cid").distinct().count() <= 16)
  }

  test("PQ top-k with exact refine: complete results and a recall floor") {
    // sf0.01 so the shortlist (50) is a strict subset of the corpus (500)
    // and the test exercises genuine approximation, not a disguised exact
    val emb01 = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = Similarity.bruteForceTopK(emb01, "vec_id", "embedding", qids, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pq = Similarity.pqTopK(emb01, "vec_id", "embedding", qids, 10,
        m = 8, codebookSize = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byQ = pq.groupBy(_._1)
    assert(byQ.keySet == qids.toSet)
    byQ.values.foreach(rows => assert(rows.length == 10))
    val recall = (exact.toSet intersect pq.toSet).size
    assert(recall >= 25, s"PQ refine recall@10 total $recall/50 (measured 35/50)")
  }

  test("IVF×PQ composed top-k: complete per-query results and a recall floor") {
    // sf0.01: 500 vectors / 32 lists ≈ 16 per inverted list, so nProbe=2
    // surfaces ~30 candidates — genuine coarse pruning on top of the PQ
    // approximation, not a disguised exact scan
    val emb01 = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = Similarity.bruteForceTopK(emb01, "vec_id", "embedding", qids, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ivfpq = Similarity.ivfPqTopK(emb01, "vec_id", "embedding", qids, 10,
        numCentroids = 32, nProbe = 2, m = 8, codebookSize = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byQ = ivfpq.groupBy(_._1)
    assert(byQ.keySet == qids.toSet)
    byQ.values.foreach(rows => assert(rows.length == 10))
    val recall = (exact.toSet intersect ivfpq.toSet).size
    assert(recall >= 10, s"IVFPQ recall@10 total $recall/50")
  }

  test("LSH top-k recall vs exact top-k is substantial") {
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, "vec_id", "embedding", qids, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // sign-LSH with 16 planes / ham<=5 on near-orthogonal data: expect
    // meaningful but not perfect recall; pin a floor to catch regressions.
    assert(recall >= 0.3, s"recall=$recall")
    assert(approx.nonEmpty)
  }
}
