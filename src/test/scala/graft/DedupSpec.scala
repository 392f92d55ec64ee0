package graft

import graft.functions.TextFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf, "documents")

  test("exact dedup: fingerprints partition all docs, survivors unique") {
    val out = Dedup.exact(docs, "doc_id", "text").cache()
    val total = out.agg(sum("group_size")).head.getLong(0)
    assert(total == docs.count())
    assert(out.select("keep_id").distinct().count() == out.count())
  }

  test("minhash-LSH pairs == exact all-pairs jaccard at tau=0.8") {
    val exact = Dedup.jaccardPairsExact(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh == exact)
  }

  test("xx-simhash blocking finds all pairs within hamming budget (vs brute force)") {
    val sig = docs.select(col("doc_id"), simhash64(tokens(col("text"))).as("sig"))
    val a = sig.toDF("id_a", "sig_a"); val b = sig.toDF("id_b", "sig_b")
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.simhashPairsXx(docs, "doc_id", "text", 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute) // pigeonhole blocking is exact for ham<=3
  }

  test("mod-prime simhash blocking is exact vs brute force on its own signature") {
    import graft.functions.HashExpressions.simhashMod
    val t = tokens(col("text"))
    val sig = docs.select(col("doc_id"),
      simhashMod(t, 28, 65537L, 1073741789L)
        .bitwiseOR(shiftleft(simhashMod(t, 28, 65539L, 1073741789L), 28)).as("sig"))
    val a = sig.toDF("id_a", "sig_a"); val b = sig.toDF("id_b", "sig_b")
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.simhashPairs(docs, "doc_id", "text", 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture should contain planted near-dups")
    assert(blocked == brute, "pigeonhole blocking must be exact for ham<=3")
  }

  test("xxhash64 and mod-prime variants both collapse identical-token docs to hamming 0") {
    // docs with IDENTICAL token multisets get identical bit votes under
    // ANY token hash, so both variants must report those pairs at
    // hamming 0 (near-identical docs may round to 0 in one hash space and
    // not the other — vote margins differ — so this is the invariant, not
    // whole-set equality)
    import spark.implicits._
    val planted = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha  beta gamma\tdelta epsilon zeta"), // same tokens, ws differs
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "completely unrelated content about spark engines"),
      (6L, "yet another different document with other words"))
      .toDF("doc_id", "text")
    val sameTokens = Set((1L, 2L), (3L, 4L))
    def ham0(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("hamming") === 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sameTokens.subsetOf(ham0(Dedup.simhashPairsXx(planted, "doc_id", "text", 3))))
    assert(sameTokens.subsetOf(ham0(Dedup.simhashPairs(planted, "doc_id", "text", 3))))
  }

  test("duplicateClusters equals brute-force union-find on a random pair graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val pairs = (1 to 40).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val df = pairs.toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val ids = pairs.flatMap { case (a, b) => Seq(a, b) }.distinct
    val groups = ids.groupBy(find)
    val expect = groups.flatMap { case (_, members) =>
      val m = members.min; members.map(_ -> m) }.toMap
    assert(got == expect)
  }

  test("semanticDedup == brute-force min-id rule within IVF clusters") {
    import graft.operators.Similarity
    val emb = Tables(spark, sf, "embeddings")
    val tau = 0.3
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding", tau = tau,
        numCentroids = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.size == emb.count(), "every row must appear exactly once")
    // brute-force replay: same deterministic codebook + assignment, then
    // the rule — drop iff a lower-id same-cluster mate has cos ≥ tau
    // (rounded at 6 decimals, the operator's determinism boundary)
    val v = emb.select(col("vec_id").as("id"), col("embedding").as("v"),
      graft.functions.VectorFunctions.normD(col("embedding")).as("vn"))
    val asg = Similarity.assignToCentroids(v, Similarity.ivfCentroids(v, 8))
      .select("id", "cid", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    asg.foreach { case (id, cid, vec) =>
      val dup = asg.exists { case (id2, cid2, vec2) =>
        cid2 == cid && id2 < id &&
          BigDecimal(cos(vec, vec2)).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= tau
      }
      assert(out(id) == ((cid, !dup)), s"row $id: got ${out(id)}, expected (${cid}, ${!dup})")
    }
    assert(asg.exists { case (id, cid, vec) => !out(id)._2 },
      "tau should be low enough that the fixture exercises the drop path")
  }

  test("simhash of near-identical docs is close, unrelated docs far") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "completely different words about spark catalyst optimizer internals")
    ).toDF("id", "t")
    val sigs = df.select(col("id"), simhash64(tokens(col("t"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(sigs(1L), sigs(2L)) < ham(sigs(1L), sigs(3L)))
  }
}
