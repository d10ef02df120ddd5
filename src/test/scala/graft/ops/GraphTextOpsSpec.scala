package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the graph (connected-components dedup clustering) and the
  * round-2 text operators (cleaning, repetition signals, TF-IDF search).
  */
class GraphTextOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
    .master("local[4]")
    .appName("graft-graphtext-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("connectedComponents labels a path, a separate edge, and a singleton") {
    val s = spark
    import s.implicits._
    // graph: 1-2-3 path, 10-11 edge, 20 isolated
    val verts = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
    val edges = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("src", "dst")
    val got = GraphOps.connectedComponents(verts, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("connectedComponents converges on a long chain (diameter > 2 rounds)") {
    val s = spark
    import s.implicits._
    val n = 12L
    val verts = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val got = GraphOps.connectedComponents(verts, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(1L), s"all $n chain vertices collapse to label 1")
  }

  test("forest and iterative CC regimes agree on random graphs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 2 + rnd.nextInt(25)
      val ids = (1L to n.toLong).toVector
      val edgeList = (1 to rnd.nextInt(2 * n)).map { _ =>
        (ids(rnd.nextInt(n)), ids(rnd.nextInt(n)))
      }.filter { case (a, b) => a != b }.distinct
      val verts = ids.toDF("id")
      val edges = edgeList.toDF("src", "dst")
      val forest = GraphOps.connectedComponents(verts, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // smallLabelThreshold = 0 forces the large-|V| iterative path on the
      // same graph — the two regimes must be bit-identical
      val iterative = GraphOps.connectedComponents(verts, edges,
          smallLabelThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(forest == iterative,
        s"regime divergence on n=$n edges=${edgeList.size}")
    }
  }

  test("triangleCountOriented equals brute force and the id-order census on random graphs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 4) {
      val n = 4 + rnd.nextInt(30)
      val edgeList = (1 to 4 * n).map { _ =>
        val a = 1L + rnd.nextInt(n); val b = 1L + rnd.nextInt(n)
        (math.min(a, b), math.max(a, b))
      }.filter { case (a, b) => a != b }.distinct
      // driver brute force: every triple with all three edges present
      val eset = edgeList.toSet
      val verts = edgeList.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
      var brute = 0L
      for {
        i <- verts.indices; j <- (i + 1) until verts.length
        if eset((verts(i), verts(j)))
        k <- (j + 1) until verts.length
        if eset((verts(j), verts(k))) && eset((verts(i), verts(k)))
      } brute += 1
      val edges = edgeList.toDF("a", "b")
      val oriented = GraphOps.triangleCountOriented(edges).head.getLong(0)
      // id-order (a<b) wedge census — the orientation-invariance witness
      val w = edges.join(edges.select(col("a").as("b2"), col("b").as("c")),
          col("b") === col("b2")).select("a", "b", "c")
      val idOrder = w.join(
          edges.select(col("a").as("ta"), col("b").as("tc")),
          col("a") === col("ta") && col("c") === col("tc"), "left_semi")
        .count()
      assert(oriented == brute && idOrder == brute,
        s"triangle census divergence n=$n m=${edgeList.size}: " +
          s"brute=$brute oriented=$oriented idOrder=$idOrder")
    }
  }

  test("triangleCountOriented canonicalizes duplicates, reversals and self-loops by default") {
    val s = spark
    import s.implicits._
    // K4 on 1..4 (4 triangles), polluted with: duplicate edges, reversed
    // orientations, and self-loops — all of which inflate degrees and
    // wedge counts if fed to the census raw. The default path must
    // canonicalize back to the simple graph; the assumeCanonical path on
    // the CLEAN list must agree.
    val clean = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    val dirty = clean ++ clean.map(_.swap) ++ clean.take(3) ++
      Seq((1L, 1L), (3L, 3L))
    assert(GraphOps.triangleCountOriented(dirty.toDF("a", "b"))
      .head.getLong(0) == 4L)
    assert(GraphOps.triangleCountOriented(
      clean.toDF("a", "b"), assumeCanonical = true).head.getLong(0) == 4L)
  }

  test("degree orientation bounds wedge fan-out on a skewed star (id order explodes)") {
    val s = spark
    import s.implicits._
    // hub 0 (the LOWEST id — worst case for a<b orientation) + 2000 spokes,
    // plus a 30-clique among spokes 1..30 so the census is non-trivial:
    // triangles = C(30,3) [inside the clique] + C(30,2) [clique edge + hub]
    val spokes = (1L to 2000L).map(i => (0L, i))
    val clique = for { i <- 1L to 30L; j <- (i + 1) to 30L } yield (i, j)
    val edges = (spokes ++ clique).toDF("a", "b")
    val expected = 30L * 29 * 28 / 6 + 30L * 29 / 2
    assert(GraphOps.triangleCountOriented(edges).head.getLong(0) == expected)
    // wedge fan-out per orientation, computed from out-degrees (no join):
    // id order puts C(deg(hub), 2) wedges on ONE key; degree order points
    // every spoke edge INTO the hub, so the hub contributes zero wedges
    def wedgeStats(oriented: Seq[(Long, Long)]): (Long, Long) = {
      val perKey = oriented.groupBy(_._1)
        .map { case (_, es) => val d = es.size.toLong; d * (d - 1) / 2 }
      (perKey.sum, perKey.max)
    }
    val el = (spokes ++ clique)
    val deg = el.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
    val (wId, maxId) = wedgeStats(el) // already a<b canonical
    val (wDeg, maxDeg) = wedgeStats(el.map { case (a, b) =>
      if (deg(a) < deg(b) || (deg(a) == deg(b) && a < b)) (a, b) else (b, a)
    })
    assert(wId >= 1999000L, s"id order should explode at the hub: $wId")
    assert(maxId >= 1999000L)
    assert(wDeg < 20000L, s"degree order must stay bounded: $wDeg")
    assert(maxDeg < 500L, s"per-key fan-out must stay bounded: $maxDeg")
  }

  test("salted hot-prefix-token mining equals unsalted on a shared-token block") {
    val s = spark
    import s.implicits._
    // Boilerplate block: 1000 docs, each = 3 unique tokens + shared token
    // "hh" + 16 commons. One commons-only filler doc makes the commons'
    // df exceed hh's, so the rarest-first prefix (len 5 at τ=0.8 sz=20)
    // is {u1,u2,u3, hh, c00} — hh sits in EVERY doc's prefix with 1000
    // index entries, the exact skewed-key threat the salt guard targets.
    // Within-block J = 17/23 < 0.8 (rejected at verify); 25 planted
    // near-identical clones (1 unique token swapped) are the true pairs.
    val commons = (0 until 16).map(i => f"c$i%02d")
    val block = (0 until 1000).map { i =>
      (i.toLong, (Seq(s"ua$i", s"ub$i", s"uc$i", "hh") ++ commons).mkString(" "))
    }
    val clones = (0 until 25).map { i =>
      (10000L + i, (Seq(s"ua${i * 7}", s"ub${i * 7}", s"zz$i", "hh") ++ commons).mkString(" "))
    }
    val filler = Seq((99999L, commons.mkString(" ")))
    val docs = (block ++ clones ++ filler).toDF("doc_id", "text")
    def pairsOf(saltEntries: Int): Set[(Long, Long, Double)] =
      DedupOps.ngramJaccardUnsorted(docs, 0.8, saltEntries)
        .select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = pairsOf(64)              // hh (1000 entries) ⇒ 16 groups
    val unsalted = pairsOf(Int.MaxValue)  // no token is ever hot
    assert(salted == unsalted, s"salted=${salted.size} unsalted=${unsalted.size}")
    // every planted clone pair found, at J = 19/21
    val expected = (0 until 25)
      .map(i => (i * 7L, 10000L + i,
        math.rint(19.0 / 21.0 * 10000) / 10000)).toSet
    assert(expected.subsetOf(salted), s"missing planted clone pairs")
    // bounded fan-in: the salted build side's (tok, group) populations
    // stay near saltEntries (2x slack for hash imbalance) — the unsalted
    // hot key would be 1000+
    val maxGroup = DedupOps.prefixTokenIndex(docs, 0.8)
      .filter(col("tok") === "hh" || col("tok") === "c00")
      .groupBy(col("tok"), pmod(xxhash64(col("rep_id")), lit(16)))
      .count().agg(max("count")).head.getLong(0)
    assert(maxGroup <= 128, s"per-group build fan-in not bounded: $maxGroup")
  }

  test("salted mining equals unsalted on random corpora (randomized hot tokens)") {
    val s = spark
    import s.implicits._
    // Small token universe ⇒ many tokens blow past a tiny saltEntries, so
    // the salted path runs over arbitrary random structure, not just the
    // crafted boilerplate block above.
    val rnd = new scala.util.Random(1211)
    for (round <- 1 to 3) {
      val universe = (0 until 25).map(i => f"t$i%02d")
      val docs = (0 until 120).map { i =>
        val n = 4 + rnd.nextInt(8)
        val toks = Seq.fill(n)(universe(rnd.nextInt(universe.length))).distinct
        (i.toLong, toks.mkString(" "))
      }.toDF("doc_id", "text")
      def pairsOf(saltEntries: Int): Set[(Long, Long, Double)] =
        DedupOps.ngramJaccardUnsorted(docs, 0.6, saltEntries)
          .select("id_a", "id_b", "jaccard").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val salted = pairsOf(8)
      val unsalted = pairsOf(Int.MaxValue)
      assert(salted == unsalted,
        s"round $round: salted=${salted.size} unsalted=${unsalted.size} " +
          s"diff=${(salted diff unsalted) ++ (unsalted diff salted)}")
      assert(salted.nonEmpty, s"round $round: degenerate corpus, no pairs mined")
      // adversarial regime: hot-token count exceeds the driver-map bound,
      // so salt widths ride a broadcast-joined frame — same output
      val distributedSalt = DedupOps
        .ngramJaccardUnsorted(docs, 0.6, saltEntries = 8, maxDriverHotToks = 0)
        .select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(distributedSalt == unsalted,
        s"round $round: broadcast-salt regime diverged " +
          s"(${distributedSalt.size} vs ${unsalted.size})")
    }
  }

  test("triangle census closes wedges by sorted intersection, broadcast when the lists fit") {
    val s = spark
    import s.implicits._
    // moderate random graph: the round-15 census counts each oriented
    // edge's |N⁺(v) ∩ N⁺(w)| with the codegen'd sorted-merge counter
    // instead of materializing wedges and semi-joining them back — the
    // plan must carry sorted_intersect_count and (the lists being
    // KB-sized here, stats known from the checkpointed oriented list)
    // broadcast the adjacency sides rather than sort-merging.
    val rnd = new scala.util.Random(3)
    val edges = (1 to 3000).map { _ =>
      val a = 1L + rnd.nextInt(300); val b = 1L + rnd.nextInt(300)
      (math.min(a, b), math.max(a, b))
    }.filter { case (a, b) => a != b }.distinct.toDF("a", "b")
    val census = GraphOps.triangleCountOriented(edges)
    census.head // drive AQE to its final plan
    val plan = census.queryExecution.executedPlan.toString
    assert(plan.contains("sorted_intersect_count"),
      s"wedge closing lost the native intersection counter:\n$plan")
    assert("BroadcastHashJoin".r.findFirstIn(plan).isDefined,
      s"adjacency attach lost the broadcast:\n$plan")
    assert(!plan.contains("LeftSemi"),
      s"wedge-materializing semi-join reappeared:\n$plan")
  }

  test("skewGuardedCandidateJoin is multiset-identical to the plain join in all regimes") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(47)
    // random probe/build frames over a small token universe: several
    // tokens exceed saltEntries=2 on the build side, several don't
    val toks = (0 until 6).map(i => s"k$i")
    val probes = (0 until 60).map { i =>
      (toks(rnd.nextInt(6)), 1 + rnd.nextInt(3), i.toLong, 5 + rnd.nextInt(5), 1 + rnd.nextInt(3))
    }.toDF("tok", "szb", "id_a", "sz_a", "pa")
    val build = (0 until 40).map { i =>
      (toks(rnd.nextInt(6)), 1 + rnd.nextInt(3), 100L + i, 5 + rnd.nextInt(5), 1 + rnd.nextInt(3))
    }.toDF("tok", "szb", "id_b", "sz_b", "pb")
    def multiset(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.groupBy("id_a", "id_b").count().collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val plain = multiset(probes.join(build, Seq("tok", "szb")))
    // driver-map regime (hot tokens fit the bound)
    val saltedMap = multiset(
      DedupOps.skewGuardedCandidateJoin(probes, build, saltEntries = 2,
        maxDriverHotToks = 10000))
    // broadcast regime (bound forced to zero)
    val saltedBcast = multiset(
      DedupOps.skewGuardedCandidateJoin(probes, build, saltEntries = 2,
        maxDriverHotToks = 0))
    // no-hot regime (threshold above any count) — the plain plan
    val none = multiset(
      DedupOps.skewGuardedCandidateJoin(probes, build, saltEntries = 1000,
        maxDriverHotToks = 10000))
    assert(plain.nonEmpty && saltedMap == plain && saltedBcast == plain && none == plain,
      s"plain=${plain.size} map=${saltedMap.size} bcast=${saltedBcast.size} none=${none.size}")
  }

  test("single-task and distributed pagerank regimes are bit-identical") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(29)
    for (iters <- Seq(1, 2, 5)) {
      val n = 5 + rnd.nextInt(20)
      val ids = (1L to n.toLong).toVector
      val pairList = (1 to 3 * n).map { _ =>
        (ids(rnd.nextInt(n)), ids(rnd.nextInt(n)))
      }.filter { case (a, b) => a < b }.distinct
      val pairs = pairList.toDF("id_a", "id_b")
      val small = GraphOps.pagerankQuantized(pairs, iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // smallEdgeThreshold = 0 forces the distributed join-per-round path
      // on the same graph — exact integer quanta must make them identical
      val dist = GraphOps.pagerankQuantized(pairs, iters, smallEdgeThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(small == dist, s"pagerank regime divergence iters=$iters n=$n")
    }
  }

  test("connectedComponents agrees with a union-find reference on random graphs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 2 + rnd.nextInt(20)
      val ids = (1L to n.toLong).toVector
      val edgeList = (1 to rnd.nextInt(2 * n)).map { _ =>
        (ids(rnd.nextInt(n)), ids(rnd.nextInt(n)))
      }.filter { case (a, b) => a != b }.distinct
      // driver-side union-find with min-label canonicalization
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edgeList.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = ids.map(i => i -> find(i)).toMap
      val verts = ids.toDF("id")
      val edges =
        if (edgeList.nonEmpty) edgeList.toDF("src", "dst")
        else Seq.empty[(Long, Long)].toDF("src", "dst")
      val got = GraphOps.connectedComponents(verts, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"n=$n edges=$edgeList")
    }
  }

  test("ngramJaccardBetween finds every cross-corpus pair (one global token order)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def mkDoc(): String =
      (1 to (5 + rnd.nextInt(4))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val left = (1L to 15L).map(i => (i, mkDoc())).toDF("doc_id", "text")
    val right = (101L to 115L).map(i => (i, mkDoc())).toDF("doc_id", "text")
    val got = DedupOps.ngramJaccardBetween(left, right, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference on the driver
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase).toSet
    val l = left.collect().map(r => r.getLong(0) -> toks(r.getString(1)))
    val rr = right.collect().map(r => r.getLong(0) -> toks(r.getString(1)))
    val expected = (for {
      (ia, ta) <- l; (ib, tb) <- rr
      j = ta.intersect(tb).size.toDouble / ta.union(tb).size
      if j >= 0.5
    } yield (ia, ib)).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("ngramJaccard equals driver brute force at adversarial τ (bound guards)") {
    val s = spark
    import s.implicits._
    // τ = 0.07 / 0.25 stress the epsilon-guarded ceil/floor prefix & size
    // bounds far from shipped thresholds (exact-integer products, extreme
    // size windows); exact verification means any miss is a BOUND bug.
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a1", "b2", "c3", "d4", "e5", "f6", "g7", "h8", "i9", "j0")
    val docs = (1L to 25L).map { i =>
      (i, (1 to (2 + rnd.nextInt(10))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase).toSet
    val all = docs.collect().map(r => r.getLong(0) -> toks(r.getString(1)))
    for (tau <- Seq(0.07, 0.25, 0.5)) {
      val got = DedupOps.ngramJaccard(docs, tau)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (ia, ta) <- all; (ib, tb) <- all if ia < ib
        j = ta.intersect(tb).size.toDouble / ta.union(tb).size
        if j >= tau
      } yield (ia, ib)).toSet
      assert(got == expected,
        s"tau $tau missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("ngramJaccardSplit equals ngramJaccardBetween on a partitioned corpus") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "pink")
    val docs = (1L to 24L).map { i =>
      (i, (1 to (4 + rnd.nextInt(4))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    import org.apache.spark.sql.functions.col
    val split = DedupOps.ngramJaccardSplit(docs,
      col("doc_id") % 2 === 1, col("doc_id") % 2 === 0, 0.6).collect().toSet
    val between = DedupOps.ngramJaccardBetween(
      docs.filter(col("doc_id") % 2 === 1),
      docs.filter(col("doc_id") % 2 === 0), 0.6).collect().toSet
    assert(split.map(_.toString) == between.map(_.toString))
    assert(split.nonEmpty, "tiny vocab should produce cross pairs")
  }

  test("repetitionSignals computes dup-token and top-bigram ratios exactly") {
    val s = spark
    import s.implicits._
    // "a b a b a": 5 tokens, 2 distinct -> dup ratio 0.6;
    // bigrams: (a b, b a, a b, b a) -> top bigram 2/4 = 0.5
    val docs = Seq((1L, "a b a b a"), (2L, "x")).toDF("doc_id", "text")
    val rows = TextOps.repetitionSignals(docs).collect()
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.getInt(1) == 5)
    assert(r1.getDouble(2) == 0.6)
    assert(r1.getDouble(3) == 0.5)
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.getInt(1) == 1 && r2.getDouble(2) == 0.0 && r2.getDouble(3) == 0.0)
  }

  test("cleanText lowercases, strips symbol runs, trims") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "  Hello,   WORLD!! 42 ")).toDF("doc_id", "text")
    val r = TextOps.cleanText(docs).head
    assert(r.getAs[String]("clean_text") == "hello world 42")
  }

  test("tfidfSearch ranks the doc with more rare-term hits first") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "rare rare common"),
      (2L, "common common common"),
      (3L, "other words only"),
      (4L, "rare common other")
    ).toDF("doc_id", "text")
    val top = TextOps.tfidfSearch(docs, Seq("rare", "common"), 3).collect()
    assert(top.length == 3)
    // doc 1 has 2x the rare term (idf ln(4/2)) -> highest score
    assert(top.head.getAs[Long]("doc_id") == 1L)
    assert(top.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
  }

  test("heavyHitters is exact and independent of partitioning") {
    val s = spark
    import s.implicits._
    // skewed stream: "hot" 500x, "warm" 60x, 100 singletons (tail)
    val items = (Seq.fill(500)("hot") ++ Seq.fill(60)("warm") ++
      (1 to 100).map(i => s"cold$i"))
    val expected = {
      val n = items.size
      items.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * 20 > n }.toMap
    }
    for (parts <- Seq(1, 3, 16)) {
      val df = items.toDF("tok").repartition(parts)
      val got = TextOps.heavyHitters(df, "tok", denom = 20)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("hashed-shuffle duplicated-substring path equals the string-shuffle graded query") {
    val dir = "/root/testdata/sf0.001"
    val hashed = TextOps.duplicatedSubstringsHashed(
        spark.read.parquet(s"$dir/documents.parquet"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val string = graft.queries.Catalog.queriesMap("dedup_substring")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed == string,
      "8-byte digest shuffle must reproduce the raw-gram result exactly")
    assert(hashed.values.exists(_ > 0), "fixture must contain duplicated substrings")
  }

  test("BPE merges are greedy-leftmost incl. the shared-boundary case") {
    val s = spark
    import s.implicits._
    // "abab" -> after rule (a,b): BOTH occurrences must merge (the second
    // one's leading separator is consumed by the first match — the case
    // the two-pass replace exists for). Corpus: 'abab' x3, 'cd' x2.
    val docs = Seq((1L, "abab abab abab cd cd")).toDF("doc_id", "text")
    val m = TextOps.bpeTrainMerges(docs, k = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // step 1: pair (a,b) appears 2x per 'abab' word-occurrence... vocab is
    // DISTINCT words weighted by count: 'abab' n=3 -> (a,b) cnt 6, (b,a) 3;
    // 'cd' n=2 -> (c,d) 2.
    assert(m(0) == ((1, "a", "b", 6L)))
    // step 2: 'abab' is now 'ab ab' (both merged!) -> (ab,ab) cnt 3 wins
    // over (c,d) cnt 2.
    assert(m(1) == ((2, "ab", "ab", 3L)))
    // step 3: only (c,d) remains.
    assert(m(2) == ((3, "c", "d", 2L)))
  }

  test("vocab-growth digest shuffle path equals the raw-gram graded query") {
    // The 100 TB path ships xxhash64(gram) (8 bytes) through the
    // first-occurrence shuffle instead of the ~13-byte gram. min-doc per
    // key and the bucketed counts are identical unless two grams collide
    // AND disagree on first doc — this fences that equivalence on real
    // data (the graded query keeps raw grams only for oracle
    // comparability).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def growth(keyed: org.apache.spark.sql.DataFrame) = keyed
      .groupBy("tok").agg(min(col("doc_id")).as("first_doc"))
      .groupBy((col("first_doc") / 10).cast("long").as("bucket"))
      .agg(count(lit(1)).as("new_toks"))
    val grams = docs.filter(length(col("text")) >= 13)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text) - 12), i -> substr(text, i, 13))"))
        .as("tok"))
    val raw = growth(grams)
    val hashed = growth(grams.select(col("doc_id"), xxhash64(col("tok")).as("tok")))
    assert(raw.exceptAll(hashed).isEmpty && hashed.exceptAll(raw).isEmpty)
  }

  test("fuzzy-match pigeonhole regime equals the direct quadratic on real names") {
    // Both regimes are exact for lev<=2; this forces the big-table
    // pigeonhole path (never taken at test SFs) and proves it loses no
    // pair against the straightforward per-block quadratic.
    val c = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"))
    val direct = graft.queries.StatQueries.fuzzyNamePairs(c, pigeonhole = false)
    val pigeon = graft.queries.StatQueries.fuzzyNamePairs(c, pigeonhole = true)
    assert(direct.exceptAll(pigeon).isEmpty && pigeon.exceptAll(direct).isEmpty)
  }

  test("pigeonhole candidates lose no pair under random <=2-edit corruptions") {
    // Adversarial recall property: corrupt base strings with random
    // combinations of substitutions / insertions / deletions (<=2 edits,
    // including the shift-inducing ins+del mixes the piece-join's ±2
    // offsets exist for) and check regime equality on every corpus.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefghij"
    def edit(str: String): String = rnd.nextInt(3) match {
      case 0 if str.nonEmpty => // substitute
        val i = rnd.nextInt(str.length)
        str.updated(i, alpha(rnd.nextInt(alpha.length)))
      case 1 => // insert
        val i = rnd.nextInt(str.length + 1)
        str.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + str.substring(i)
      case _ if str.length > 1 => // delete
        val i = rnd.nextInt(str.length)
        str.substring(0, i) + str.substring(i + 1)
      case _ => str
    }
    for (trial <- 0 until 3) {
      val bases = (0 until 40).map(i =>
        (0 until 15).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      val rows = bases.zipWithIndex.flatMap { case (b, i) =>
        val corrupted = (1 to 2).map { j =>
          val nEdits = 1 + rnd.nextInt(2)
          (1 to nEdits).foldLeft(b)((acc, _) => edit(acc))
        }
        (b +: corrupted).zipWithIndex.map { case (name, j) =>
          (i * 10L + j, name, 1, "SEG")
        }
      }
      val c = rows.toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
      val direct = graft.queries.StatQueries.fuzzyNamePairs(c, pigeonhole = false)
      val pigeon = graft.queries.StatQueries.fuzzyNamePairs(c, pigeonhole = true)
      assert(direct.exceptAll(pigeon).isEmpty && pigeon.exceptAll(direct).isEmpty,
        s"trial $trial: pigeonhole missed pairs")
    }
  }
}
