package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Dedup

/** Unit guards for the dedup family that the sf-scale oracle queries can't
  * pin: prefix-filter losslessness under adversarial repeated k-grams, and
  * (via SkewSpec-style row guards) degenerate-corpus behavior. */
class DedupSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Brute-force reference: distinct k-word shingle sets, all-pairs Jaccard
    * within (lang, source) blocks. */
  private def bruteForce(docs: Seq[(Long, String, String, String)],
      threshold: Double, k: Int = 3): Set[(Long, Long)] = {
    def sh(text: String): Set[String] = {
      val toks = text.trim.split("\\s+").toSeq
      toks.sliding(k).filter(_.size == k).map(_.mkString(" ")).toSet
    }
    val withSets = docs.map { case (id, text, lang, src) =>
      (id, sh(text), lang, src) }
    (for {
      (ia, sa, la, ca) <- withSets
      (ib, sb, lb, cb) <- withSets
      if ia < ib && la == lb && ca == cb
      inter = (sa intersect sb).size
      union = sa.size + sb.size - inter
      if union > 0 && inter.toDouble / union >= threshold
    } yield (ia, ib)).toSet
  }

  test("prefix filter is lossless with repeated rare shingles (ADVICE r2)") {
    import spark.implicits._
    // The adversarial shape from the advice: a doc where one rare shingle
    // region repeats many times while common singletons fill the suffix.
    // If n_sh were computed over MULTISET shingle rows, the prefix would
    // shrink below the ceil(t*|set|) bound and drop qualifying pairs.
    val repeatedRare = (("r1 r2 r3 " * 6) + "c1 c2 c3 c4 c5 c6 c7").trim
    val partner = "r1 r2 r3 x1 x2 c1 c2 c3 c4 c5 c6 c7"
    val rnd = new scala.util.Random(11)
    val vocab = (1 to 12).map(i => s"w$i")
    val randomDocs = (10L to 25L).map { id =>
      val words = Seq.fill(10 + rnd.nextInt(8))(
        vocab(rnd.nextInt(vocab.size)))
      (id, words.mkString(" "), "en", "web")
    }
    val all = Seq(
      (1L, repeatedRare, "en", "web"),
      (2L, partner, "en", "web"),
      // same text, different block: must NOT pair with 1/2
      (3L, partner, "de", "web")) ++ randomDocs
    val docs = all.toDF("doc_id", "text", "lang", "source")
    for (t <- Seq(0.2, 0.4, 0.6)) {
      val got = Dedup.ngramJaccardPairsOf(docs, t)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = bruteForce(all, t)
      assert(got == want, s"threshold $t: prefix-filtered pairs diverge " +
        s"from brute force (missing=${want -- got}, extra=${got -- want})")
    }
  }

  /** Driver-side union-find: the ground truth for component tests. */
  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    parent.keys.map(x => x -> find(x)).toMap
  }

  test("connected components: chain, clique, singleton-free mapping") {
    import spark.implicits._
    // adversarial CHAIN 1-2-...-12 (diameter 11 — label propagation's worst
    // case), a triangle, a 2-clique, and a shared-min star
    val edges = (1L to 11L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L),
        (40L, 41L), (40L, 42L), (40L, 43L), (43L, 44L))
    val got = graft.operators.ConnectedComponents
      .components(edges.toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == bruteComponents(edges))
  }

  test("connected components: shared member with two centers must merge") {
    import spark.implicits._
    // regression: {(16,3),(16,6)} has DISJOINT member/center sets, so a
    // convergence probe checking only disjointness stops at round 0 and
    // never merges components 3 and 6
    val edges = Seq((16L, 3L), (16L, 6L))
    val got = graft.operators.ConnectedComponents
      .components(edges.toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(3L -> 3L, 6L -> 3L, 16L -> 3L), got)
  }

  test("connected components: sparse random graphs match union-find") {
    import spark.implicits._
    // sparse graphs (fewer edges than nodes) are where premature
    // convergence shows: many small odd-shaped components
    for (seed <- Seq(1, 2, 3, 4, 5)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 300).map { _ =>
        (rnd.nextInt(500).toLong, rnd.nextInt(500).toLong)
      }.filter { case (u, v) => u != v }
      val got = graft.operators.ConnectedComponents
        .components(edges.toDF("u", "v"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == bruteComponents(edges), s"seed $seed")
    }
  }

  test("connected components: duplicate/reversed/self edges are harmless") {
    import spark.implicits._
    val edges = Seq((2L, 1L), (1L, 2L), (2L, 2L), (3L, 2L), (2L, 3L))
    val got = graft.operators.ConnectedComponents
      .components(edges.toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("connected components: random graph matches union-find in O(log n) rounds") {
    import spark.implicits._
    // 1500 nodes, ~2000 edges: a mix of chains, stars, and random
    // attachments — components must match union-find exactly, and the
    // round count must stay logarithmic (the 100 TB viability property;
    // label propagation would need O(diameter) ≈ hundreds of rounds on
    // the chain parts)
    for (seed <- Seq(7, 23, 101)) {
      val rnd = new scala.util.Random(seed)
      val chain = (1000L to 1400L).sliding(2).map(s => (s(0), s(1))).toSeq
      val rand = (1 to 1600).map { _ =>
        val u = rnd.nextInt(1500).toLong; val v = rnd.nextInt(1500).toLong
        (u, v)
      }.filter { case (u, v) => u != v }
      val edges = chain ++ rand
      val (cc, rounds) = graft.operators.ConnectedComponents
        .componentsWithRounds(edges.toDF("u", "v"))
      val got = cc.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == bruteComponents(edges), s"seed $seed")
      assert(rounds <= 15,
        s"seed $seed: convergence took $rounds rounds — log² bound broken")
    }
  }

  test("connected components: empty edge set yields empty mapping") {
    import spark.implicits._
    val got = graft.operators.ConnectedComponents
      .components(Seq.empty[(Long, Long)].toDF("u", "v"))
    assert(got.count() == 0)
  }

  test("dup clusters equal the transitive closure of the LSH pairs") {
    val pairs = Dedup.minhashLsh(spark, sfDir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = bruteComponents(pairs)
    val rows = Dedup.dupClusters(spark, sfDir).collect()
    rows.foreach { r =>
      val (id, cl, surv) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(cl == want.getOrElse(id, id), s"doc $id cluster")
      assert(surv == (if (cl == id) 1 else 0), s"doc $id survivor flag")
    }
    // every document appears exactly once
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.length == docs)
  }

  test("canonical survivor is the longest cluster member, not the min id") {
    import spark.implicits._
    // 10 and 11 share identical text (certain near-dup pair); 11 carries
    // MORE content (n_chars) so the quality policy must pick it over the
    // min-id 10; 20 is a singleton and survives trivially
    val docs = Seq(
      (10L, "aa bb cc dd ee ff gg hh", 100L),
      (11L, "aa bb cc dd ee ff gg hh", 300L),
      (20L, "zz yy xx ww vv uu tt ss", 50L)).toDF("doc_id", "text", "n_chars")
    val got = Dedup.canonicalDocsOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3)))
      .toMap
    assert(got(10L) == ((10L, 11L, 0)), got(10L).toString) // cluster min-id 10, canonical 11
    assert(got(11L) == ((10L, 11L, 1)))
    assert(got(20L) == ((20L, 20L, 1)))
    // tie on n_chars -> smaller doc_id wins
    val tied = Seq(
      (10L, "aa bb cc dd ee ff gg hh", 100L),
      (11L, "aa bb cc dd ee ff gg hh", 100L)).toDF("doc_id", "text", "n_chars")
    val t2 = Dedup.canonicalDocsOf(tied).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(t2(10L) == 10L && t2(11L) == 10L)
  }

  test("decontaminate flags exactly the docs sharing a 3-gram with bench") {
    import spark.implicits._
    // bench doc 97 shares "a b c" with train doc 1; doc 2 shares nothing;
    // doc 3 has <3 tokens (no shingles — never contaminated); doc 194 is
    // also bench (excluded from output)
    val docs = Seq(
      (97L, "a b c d e"), (194L, "zz yy xx"),
      (1L, "x a b c y"), (2L, "p q r s t"), (3L, "a b"),
      (4L, "ww zz yy xx vv")).toDF("doc_id", "text")
    val got = Dedup.decontaminateOf(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 1))
  }

  test("fuzzy decontaminate flags near-dups of bench docs, not exact-overlap-free docs") {
    import spark.implicits._
    // 31/62 are bench (id % 31 == 0); train doc 1 is an exact copy of
    // bench 31 (identical signature — est_sim 1 ≥ 0.5 by construction),
    // train doc 2 shares nothing, train doc 3 near-dups ANOTHER TRAIN
    // doc only (5) — corpus-internal duplication is NOT contamination
    val docs = Seq(
      (31L, "a b c d e f g h"), (62L, "q w e r t y u i"),
      (1L, "a b c d e f g h"), (2L, "k l m n o p"),
      (3L, "s t u v w x y z"), (5L, "s t u v w x y z"))
      .toDF("doc_id", "text")
    val got = Dedup.fuzzyDecontaminateOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList
    val byId = got.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!byId.contains(31L) && !byId.contains(62L)) // bench excluded
    assert(byId(1L) == (1L, 1), byId(1L)) // one bench hit
    assert(byId(2L) == (0L, 0), byId(2L))
    assert(byId(3L) == (0L, 0), byId(3L)) // train-train dup ≠ contaminated
    assert(byId(5L) == (0L, 0), byId(5L))
  }

  test("containment finds an embedded doc that symmetric Jaccard misses") {
    import spark.implicits._
    // B embeds all of A's text (containment 1.0) but J = 3/7 < 0.8;
    // C is unrelated; D is a >3× blowup of A — outside the ratio bound
    val docs = Seq(
      (1L, "a b c d e", "en", "s"),
      (2L, "a b c d e f g h i", "en", "s"),
      (3L, "p q r s t u", "en", "s"),
      (4L, "a b c d e " + (1 to 20).map(i => s"w$i").mkString(" "), "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Dedup.containmentPairsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet == Set((1L, 2L)), got)
    assert(got((1L, 2L)) == (3L, 3L, 7L, 1.0), got)
    // the same pair is invisible to the Jaccard query at 0.8
    val j = Dedup.ngramJaccardPairsOf(docs, threshold = 0.8).collect()
    assert(j.isEmpty, j.toSeq)
  }

  test("hash split is a deterministic total 80/10/10 partition by bucket") {
    val rows = graft.llm.Sampling.hashSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, b, s) =>
      assert(b >= 0 && b < 100)
      val expect = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(s == expect)
    }
    // pure function of doc_id: a second run is identical
    val again = graft.llm.Sampling.hashSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("split leakage audit counts exactly the eval docs with a train twin") {
    import spark.implicits._
    val got = graft.llm.Sampling.splitLeakage(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got.keySet == Set("val", "test"))
    // brute-force reference over the same rule
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("h"),
        graft.llm.Sampling.splitName(
          graft.llm.Sampling.splitBucket(col("doc_id"))).as("split"))
      .as[(Long, String, String)].collect()
    val trainH = docs.collect { case (_, h, "train") => h }.toSet
    for (s <- Seq("val", "test")) {
      val ev = docs.filter(_._3 == s)
      val leaked = ev.count(d => trainH(d._2))
      val (nDocs, nLeaked, rate) = got(s)
      assert(nDocs == ev.length && nLeaked == leaked)
      assert(math.abs(rate - leaked.toDouble / ev.length) < 1e-6)
    }
  }

  test("content and near-dup splits keep duplicate docs in one split") {
    import spark.implicits._
    // content split: every exact-dup class (same md5) has ONE split
    val cs = graft.llm.Sampling.contentSplit(spark, sfDir)
      .join(spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), md5(col("text")).as("h")), "doc_id")
    val splitsPerHash = cs.groupBy("h")
      .agg(countDistinct("split").as("k"))
      .agg(max("k")).as[Long].head()
    assert(splitsPerHash == 1L)
    // so its exact-dup leakage is structurally zero
    val csRows = cs.select("doc_id", "h", "split")
      .as[(Long, String, String)].collect()
    val trainH = csRows.collect { case (_, h, "train") => h }.toSet
    assert(!csRows.exists(r => r._3 != "train" && trainH(r._2)))
    // near-dup split: every LSH cluster has ONE split, and the split is
    // the hash-bucket rule applied to the cluster id
    val ns = graft.llm.Sampling.neardupSplit(spark, sfDir)
    val perCluster = ns.groupBy("cluster_id")
      .agg(countDistinct("split").as("k"))
      .agg(max("k")).as[Long].head()
    assert(perCluster == 1L)
    val expected = ns.select(col("doc_id"),
        graft.llm.Sampling.splitName(
          graft.llm.Sampling.splitBucket(col("cluster_id"))).as("e"))
    val mismatched = ns.join(expected, "doc_id")
      .filter(col("split") =!= col("e")).count()
    assert(mismatched == 0L)
  }

  test("two-phase source cap equals the naive per-source window") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = graft.llm.Sampling.sourceCapOf(docs, pct = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val cap = docs.count() * 3 / 100
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val naive = docs
      .select(col("doc_id"), col("source"), row_number().over(w).as("rk"))
      .filter(col("rk") <= cap)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == naive)
    // every source contributes exactly min(cap, n_s)
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perSrc = got.groupBy(_._2).map { case (s, g) => s -> g.size.toLong }
    assert(perSrc == sizes.map { case (s, n) => s -> math.min(cap, n) })
    // and a skewed fixture exercises an active boundary bucket
    import spark.implicits._
    val skew = (1L to 200L).map(i =>
      (i, if (i <= 150) "hot" else "cold", s"t$i"))
      .toDF("doc_id", "source", "text")
    val capped = graft.llm.Sampling.sourceCapOf(skew, pct = 30)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byS = capped.groupBy(_._2).map { case (s, g) => s -> g.size }
    assert(byS == Map("hot" -> 60, "cold" -> 50)) // cap=60 binds hot only
  }

  test("salted two-phase stratified sample equals the naive single window") {
    import org.apache.spark.sql.expressions.Window
    val k = 7
    val got = graft.llm.Sampling.stratifiedSample(spark, sfDir, k, salts = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val naive = docs
      .select(col("doc_id"), col("lang"), row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == naive)
    // every stratum contributes exactly min(k, |stratum|) rows
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perLang = got.groupBy(_._2).map { case (l, s) => l -> s.size }
    assert(perLang == sizes.map { case (l, n) => l -> math.min(k.toLong, n).toInt })
  }
}
