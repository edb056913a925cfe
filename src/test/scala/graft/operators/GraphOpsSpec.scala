package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {

  private def docs = Catalog.t(spark, sfDir, "documents")
  private lazy val n = docs.count()

  test("linkEdges emits exactly OutDeg edges per node, all targets in-domain") {
    val e = GraphOps.linkEdges(docs, n).cache()
    assert(e.count() == GraphOps.OutDeg * n)
    val perSrc = e.groupBy("src").count().agg(min("count"), max("count")).head()
    assert(perSrc.getLong(0) == GraphOps.OutDeg && perSrc.getLong(1) == GraphOps.OutDeg)
    val dom = e.agg(min("dst"), max("dst")).head()
    assert(dom.getLong(0) >= 0 && dom.getLong(1) < n)
  }

  test("degree histogram accounts for every node and every edge") {
    val h = Catalog.byName("g02_degree_histogram").build(spark, sfDir).collect()
    assert(h.map(_.getLong(1)).sum == n) // nodes partition into degree classes
    assert(h.map(r => r.getLong(0) * r.getLong(1)).sum == GraphOps.OutDeg * n) // Σ deg = |E|
    // the md5 edge mix must produce a non-degenerate profile (the linear
    // mix regression: a bijective map gives ONE class at OutDeg)
    assert(h.length > 3, s"degenerate in-degree profile: ${h.mkString(",")}")
  }

  test("pagerank: zero-in-degree nodes sit at the base mass; all masses above it") {
    val pr = Catalog.byName("g01_link_pagerank").build(spark, sfDir)
    val zeroIn = docs.select(col("doc_id"))
      .join(GraphOps.linkEdges(docs, n).select(col("dst").as("doc_id")), Seq("doc_id"), "left_anti")
    val zeroMasses = pr.join(zeroIn, "doc_id").select("mass").distinct().collect()
    assert(zeroMasses.nonEmpty, "fixture has no zero-in-degree node — mix degenerated")
    assert(zeroMasses.forall(_.getLong(0) == 150000L))
    val mn = pr.agg(min("mass")).head().getLong(0)
    assert(mn >= 150000L)
  }

  test("pagerank mass is conserved up to floor loss") {
    // every division floors, so total mass can only leak downward — and by
    // less than (OutDeg + 100) units per node per iteration
    val total = Catalog.byName("g01_link_pagerank").build(spark, sfDir)
      .agg(sum("mass")).head().getLong(0)
    assert(total <= n * GraftScale)
    assert(total > n * GraftScale * 9 / 10)
  }
  private val GraftScale = GraphOps.Scale

  test("pagerank build is deterministic across runs") {
    val a = Catalog.byName("g01_link_pagerank").build(spark, sfDir).collect()
    val b = Catalog.byName("g01_link_pagerank").build(spark, sfDir).collect()
    assert(a.sameElements(b))
  }

  test("g03: per-node counts match a driver-side brute-force triangle count") {
    // independent first-principles oracle: collect the undirected simple
    // graph (bounded: 3n edges) and count triangles via neighbor-set
    // intersection per edge — no orientation, no joins.
    val und = GraphOps.linkEdges(docs, n)
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbr = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    und.foreach { case (u, v) => nbr(u) += v; nbr(v) += u }
    val perNode = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    und.foreach { case (u, v) =>
      (nbr(u) & nbr(v)).foreach { w => // triangle (u,v,w) seen once per edge
        perNode(u) += 1; perNode(v) += 1; perNode(w) += 1
      }
    }
    // each triangle has 3 edges, so the edge sweep counts it 3× per node
    val expected = perNode.map { case (k, c) => k -> c / 3 }.filter(_._2 > 0)
    val got = Catalog.byName("g03_triangle_count").build(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected.toMap, s"triangle participation mismatch")
    assert(got.nonEmpty, "fixture graph has no triangles — signal degenerate")
  }

  test("g04: two HITS rounds match a driver-side brute-force walk from unit hubs") {
    val ed = GraphOps.linkEdges(docs, n).where(col("src") =!= col("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val a1 = ed.groupBy(_._2).view.mapValues(_.length.toLong).toMap // auth₁ = in-degree
    val h1 = ed.groupBy(_._1).view
      .mapValues(_.map(e => a1.getOrElse(e._2, 0L)).sum).toMap
    val a2 = ed.groupBy(_._2).view
      .mapValues(_.map(e => h1.getOrElse(e._1, 0L)).sum).toMap
    val out = Catalog.byName("g04_hits").build(spark, sfDir).collect()
    assert(out.length == n)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getAs[Long]("hub_mass") == h1.getOrElse(id, 0L), s"hub mass of $id")
      assert(r.getAs[Long]("auth_mass") == a2.getOrElse(id, 0L), s"auth mass of $id")
    }
    // mutual reinforcement must separate nodes: a constant column would
    // mean the graph degenerated to regular (the g01 linear-mix lesson)
    assert(out.map(_.getAs[Long]("hub_mass")).distinct.length > 3)
    assert(out.map(_.getAs[Long]("auth_mass")).distinct.length > 3)
  }

  test("g05: peel trajectory matches a driver-side brute-force 3-round k-core peel") {
    val base = GraphOps.linkEdges(docs, n).where(col("src") =!= col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var und: Set[(Long, Long)] =
      base.flatMap { case (u, v) => Seq((u, v), (v, u)) }.toSet
    val expected = (1 to 3).map { r =>
      val deg = und.groupBy(_._1).view.mapValues(_.size).toMap
      val surv = deg.filter(_._2 >= GraphOps.KCoreK).keySet
      und = und.filter { case (u, v) => surv(u) && surv(v) }
      (r.toLong, und.map(_._1).size.toLong, und.size.toLong / 2)
    }
    val got = Catalog.byName("g05_kcore").build(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges")))
    assert(got.toSeq == expected, s"peel trajectory mismatch: $got vs $expected")
    // the peel must actually remove something, and must not empty the core
    assert(got.head._2 < n && got.last._2 > 0, s"degenerate peel: $got")
  }

  test("g06: community histogram == driver-side union-find over the capped subgraph") {
    val cap = GraphOps.CommunityCap
    val capped = docs.where(col("doc_id") < cap).select("doc_id").collect().map(_.getLong(0))
    val edges = GraphOps.linkEdges(docs.where(col("doc_id") < cap), n)
      .where(col("src") =!= col("dst") && col("dst") < cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map(capped.map(x => x -> x): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = capped.groupBy(find).values.map(_.length).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Catalog.byName("g06_community_sizes").build(spark, sfDir).collect()
      .map(r => r.getAs[Long]("n_members").toInt -> r.getAs[Long]("n_communities")).toMap
    assert(got == expected, s"histogram mismatch: $got vs $expected")
    assert(got.keys.sum > 0 && got.values.sum >= 1)
  }

  test("g07: top-20 == driver brute-force Jaccard over non-edges; cap is a fixture no-op") {
    val und = GraphOps.linkEdges(docs, n).where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    und.foreach { case (u, v) => adj(u) = adj(u) + v; adj(v) = adj(v) + u }
    // the pivot cap must be a no-op on this fixture — if the degree profile
    // ever grows past it the oracle stays aligned, but the spec should say so
    assert(adj.values.forall(_.size <= GraphOps.LinkPredPivotCap),
      "fixture degree profile crossed LinkPredPivotCap — brute force below must apply the cap")
    val edgeSet = und.toSet
    val common = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    for ((_, nbrs) <- adj; s = nbrs.toSeq.sorted; i <- s.indices; j <- (i + 1) until s.size)
      common((s(i), s(j))) += 1
    val expect = common.toSeq.collect { case ((a, b), c) if !edgeSet((a, b)) =>
      (a, b, c, c * 1000000L / (adj(a).size + adj(b).size - c))
    }.sortBy { case (a, b, _, sc) => (-sc, a, b) }.take(GraphOps.LinkPredK)
    val got = Catalog.byName("g07_link_prediction").build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect, s"link-prediction top-k mismatch:\n$got\nvs\n$expect")
    // predictions must be genuinely informative: at least one multi-witness pair
    assert(got.exists(_._3 >= 2), s"degenerate prediction set (all single-witness): $got")
  }

  test("c51 recursive CTE matches a driver-side walk DP; total walk mass is OutDeg-geometric") {
    val docs = Catalog.t(spark, sfDir, "documents")
    val n = docs.count()
    val edges = GraphOps.linkEdges(docs, n).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // walk DP: w_0 = {0: 1}; w_{k+1}(v) = Σ over edge multiset (u,v) of w_k(u)
    var w = Map(0L -> 1L)
    val minDepth = scala.collection.mutable.Map(0L -> 0)
    val walks = scala.collection.mutable.Map(0L -> 1L)
    for (k <- 1 to GraphOps.ReachDepth) {
      val next = scala.collection.mutable.Map.empty[Long, Long]
      edges.foreach { case (u, v) =>
        w.get(u).foreach(c => next(v) = next.getOrElse(v, 0L) + c)
      }
      w = next.toMap
      w.foreach { case (v, c) =>
        if (!minDepth.contains(v)) minDepth(v) = k
        walks(v) = walks.getOrElse(v, 0L) + c
      }
    }
    val got = Catalog.byName("c51_recursive_cte").build(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got == minDepth.map { case (v, d) => v -> (d, walks(v)) }.toMap)
    // every walk of every length 0..depth is counted exactly once:
    // Σ n_walks = Σ_k OutDeg^k (each node has exactly OutDeg out-edges)
    val geom = (0 to GraphOps.ReachDepth)
      .map(k => math.pow(GraphOps.OutDeg, k).toLong).sum
    assert(got.values.map(_._2).sum == geom, s"walk mass != $geom")
    assert(got(0L)._1 == 0, "seed node must report depth 0")
  }

  test("g10 personalized pagerank == driver trajectory; mass is seed-local") {
    val docs = Catalog.t(spark, sfDir, "documents")
    val n = docs.count()
    val edges = GraphOps.linkEdges(docs, n).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val seedMass = GraphOps.Scale * GraphOps.PprSeedMod
    val seedBase = GraphOps.BaseMass * GraphOps.PprSeedMod
    var m = ids.map(id => id -> (if (id % GraphOps.PprSeedMod == 0) seedMass else 0L)).toMap
    for (_ <- 1 to 3) {
      val in = scala.collection.mutable.Map.empty[Long, Long]
      edges.foreach { case (src, dst) =>
        in(dst) = in.getOrElse(dst, 0L) + m(src) / GraphOps.OutDeg
      }
      m = ids.map { id =>
        val base = if (id % GraphOps.PprSeedMod == 0) seedBase else 0L
        id -> (base + GraphOps.DampNum * in.getOrElse(id, 0L) / 100)
      }.toMap
    }
    val got = Catalog.byName("g10_personalized_pagerank").build(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == m)
    // the personalization is genuinely local: unreached nodes hold 0 mass
    assert(got.values.count(_ == 0L) > 0, "no zero-mass node — PPR degenerated to global PR")
    // and every seed keeps at least its own teleport mass
    ids.filter(_ % GraphOps.PprSeedMod == 0)
      .foreach(sd => assert(got(sd) >= seedBase, s"seed $sd below teleport base"))
  }

  test("g11 assortativity == driver-side Pearson r over endpoint degrees") {
    val und = GraphOps.linkEdges(docs, n).where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = und.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val deg = adj.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val (m, sx, sy, sxy, sxx, syy) = adj.foldLeft((0L, 0L, 0L, 0L, 0L, 0L)) {
      case ((m0, a, b, c, d2, e), (x, y)) =>
        val dx = deg(x); val dy = deg(y)
        (m0 + 1, a + dx, b + dy, c + dx * dy, d2 + dx * dx, e + dy * dy)
    }
    val expected = (m * sxy - sx * sy).toDouble /
      math.sqrt((m * sxx - sx * sx).toDouble * (m * syy - sy * sy).toDouble)
    val r = Catalog.byName("g11_assortativity").build(spark, sfDir).head()
    assert(r.getAs[Long]("m") == m)
    assert(r.getAs[Long]("sx") == sx && r.getAs[Long]("sxy") == sxy)
    assert(r.getAs[Double]("assortativity") == expected, "r must be bit-identical")
    // the symmetric formulation makes sx == sy by construction
    assert(sx == sy)
  }

  test("g13 modularity: Σd_c = 2m, members conserved, contributions exact, Q bounded") {
    val und = GraphOps.linkEdges(docs, n).where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v")).distinct()
    val m = und.count()
    val rows = Catalog.byName("g13_modularity").build(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length > 1, "LP must produce more than one community")
    assert(rows.map(_.getAs[Long]("n_members")).sum == n, "every doc in exactly one community")
    assert(rows.map(_.getAs[Long]("dc")).sum == 2 * m, "handshake law: Σ d_c = 2m")
    val sumEc = rows.map(_.getAs[Long]("ec")).sum
    assert(sumEc <= m, "intra-community edges cannot exceed the edge count")
    assert(sumEc < m, "LP labels must cut SOME edge or modularity degenerates to the CC case")
    rows.foreach(r => assert(r.getAs[Long]("q_contrib_num") ==
      4 * m * r.getAs[Long]("ec") - r.getAs[Long]("dc") * r.getAs[Long]("dc")))
    val q = rows.map(_.getAs[Long]("q_contrib_num")).sum.toDouble / (4.0 * m * m)
    assert(q >= -0.5 && q <= 1.0, s"modularity $q out of Newman's range")
  }
}
