package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale stress for the graph family (PageRank / triangles): generates a
  * synthetic graph with PLANTED closed-form structure — a ring through
  * all N nodes plus a star inside every block of K consecutive nodes
  * (center = the block's first node) — and asserts the analytics recover
  * it exactly at millions of edges:
  *
  *  - distinct undirected edges  = N + (N/K)·(K−2)
  *    (ring N, stars (N/K)·(K−1), minus the N/K star edges that
  *    duplicate a ring edge);
  *  - triangles = (N/K)·(K−2): exactly the (j, j+1, center) wedges where
  *    j and j+1 both lie strictly inside a block;
  *  - PageRank conserves its integer mass up to floor loss, emits every
  *    node exactly once, and ranks every star center above every
  *    non-center (degree K+1 vs 3).
  *
  * Run: sbt "Test/runMain graft.ext.ScaleGraph [nNodes] [blockK]"
  */
object ScaleGraph {

  /** Ring ∪ per-block star, normalized to distinct (a < b) pairs. */
  def generate(spark: SparkSession, n: Long, k: Long): DataFrame = {
    val ids = spark.range(0, n)
    val ring = ids.select(col("id").as("x"), ((col("id") + 1) % n).as("y"))
    val star = ids.where(col("id") % k =!= 0)
      .select(col("id").as("x"), (col("id").divide(k).cast("long") * k).as("y"))
    ring.unionByName(star)
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val k = args.drop(1).headOption.map(_.toLong).getOrElse(64L)
    require(n % k == 0, "nNodes must be a multiple of blockK")
    val spark = graft.Graft.session("scale-graph")
    val edges = generate(spark, n, k).localCheckpoint() // isolate gen cost
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      r
    }
    val blocks = n / k
    println(s"== ScaleGraph: $n nodes, ${n + blocks * (k - 2)} edges ==")

    val tri = t("triangles") {
      Graph.triangleStats(edges).collect().head
    }
    assert(tri.getLong(0) == blocks * (k - 2),
      s"triangles ${tri.getLong(0)}, want ${blocks * (k - 2)}")
    assert(tri.getLong(1) == n + blocks * (k - 2),
      s"edges ${tri.getLong(1)}, want ${n + blocks * (k - 2)}")
    assert(tri.getLong(2) == n, s"nodes ${tri.getLong(2)}, want $n")

    // multi-source BFS from every block center: the star edges put each
    // non-center exactly 1 hop from its center — an exact closed form —
    // and the empty hop-2 frontier exercises the early-exit path
    val bfs = t("bfs-centers") {
      val seeds = spark.range(0, n, k, spark.sparkContext.defaultParallelism)
        .select(col("id").as("node"))
      Graph.bfsHops(edges, seeds, maxHops = 2)
        .groupBy("hops").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(bfs == Map(0L -> blocks, 1L -> (n - blocks)), s"bfs hops $bfs")

    val pr = t("pagerank-3") {
      Graph.pagerank(edges, iterations = 3)
        .select(col("node"), col("rank_scaled"), (col("node") % k === 0).as("c"))
        .groupBy("c").agg(count(lit(1)).as("cnt"),
          sum("rank_scaled").as("mass"),
          min("rank_scaled").as("lo"), max("rank_scaled").as("hi"))
        .collect().map(r => r.getBoolean(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    }
    val (cCnt, cMass, cLo, _) = pr(true)
    val (iCnt, iMass, _, iHi) = pr(false)
    assert(cCnt + iCnt == n, s"rank rows ${cCnt + iCnt}, want $n")
    val mass = cMass + iMass
    // floors only ever destroy mass, never create it; per iteration the
    // loss is < 1 unit per directed edge (share floor, ~4n edges here)
    // + 1 per node (the 85%/100 floor), so 3 iterations + the seed stay
    // under 16n — i.e. conservation holds to ~0.003% of total mass
    assert(mass <= 1000000000000L && mass > 1000000000000L - 16 * n,
      s"rank mass $mass out of bounds")
    assert(cLo > iHi,
      s"some center ranked below a non-center: centers ≥ $cLo, interior ≤ $iHi")
    println(f"  mass conserved: $mass (loss ${1000000000000L - mass})")

    // link scores through the hub regime: every strict-interior star edge
    // (center c, j) with j in [c+3, c+k-3] has a closed form — N(j) =
    // {j-1, j+1, c}, both witnesses degree 3, center degree k — so
    // jaccard = 2/(k+1) and adamic-adar = 2·round(1/ln 3, 6). The wedge
    // orientation enumerates these from the degree-3 end; un-oriented,
    // each hub edge would fan out the center's k neighbors instead.
    val strictPerBlock = k - 5
    val jac = t("neighbor-jaccard") {
      Graph.neighborJaccard(edges).localCheckpoint()
    }
    assert(jac.count() == n + blocks * (k - 2), "jaccard must emit every edge")
    val strict = jac.where(col("a") % k === 0 &&
      (col("b") - col("a")).between(3, k - 3))
    val okStrict = strict.where(col("common") === 2 && col("da") === k &&
      col("db") === 3 && col("jaccard") === lit(2.0 / (k + 1))).count()
    assert(okStrict == blocks * strictPerBlock,
      s"strict hub-edge jaccard: $okStrict ok, want ${blocks * strictPerBlock}")

    val aa = t("adamic-adar") {
      Graph.adamicAdar(edges)
        .where(col("a") % k === 0 && (col("b") - col("a")).between(3, k - 3))
        .where(col("common") === 2 && col("adamic_adar") === lit(1.820478))
        .count()
    }
    assert(aa == blocks * strictPerBlock,
      s"strict hub-edge adamic-adar: $aa ok, want ${blocks * strictPerBlock}")

    // HITS on the directed (a < b) orientation: every star edge leaves
    // its center (the block min), so centers are pure hubs (out-degree
    // ~k+1 vs ≤ 2) and members pure authorities — after 2 iterations the
    // hub/authority split must be TOTAL: every center's hub above every
    // non-center's, every member's authority above every center's.
    val hits = t("hits-2") {
      Graph.hits(edges, iterations = 2)
        .withColumn("c", col("node") % k === 0)
        .groupBy("c").agg(count(lit(1)).as("cnt"),
          min("hub_scaled").as("hLo"), max("hub_scaled").as("hHi"),
          min("auth_scaled").as("aLo"), max("auth_scaled").as("aHi"))
        .collect().map(r => r.getBoolean(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    }
    val (hcCnt, hcHubLo, _, _, hcAuthHi) = hits(true)
    val (hiCnt, _, hiHubHi, hiAuthLo, _) = hits(false)
    assert(hcCnt + hiCnt == n, s"hits rows ${hcCnt + hiCnt}, want $n")
    assert(hcHubLo > hiHubHi,
      s"a non-center out-hubbed a center: centers ≥ $hcHubLo, interior ≤ $hiHubHi")
    assert(hiAuthLo > hcAuthHi,
      s"a center out-authed a member: members ≥ $hiAuthLo, centers ≤ $hcAuthHi")

    // 3-core peel, 3 rounds: the block's c+1 node has degree 2 ({c, c+2}
    // — its ring edge to c duplicates a star edge), so each round
    // unravels exactly one more interior node per block: c+1, then c+2,
    // then c+3. The survivor histogram has a closed form — per block one
    // center at residual degree k-3, the chain head c+4 at 2 (its c+3
    // neighbor just left), and k-5 interior nodes at 3.
    val core = t("kcore-3x3") {
      Graph.kcorePeel(edges, k = 3, rounds = 3)
        .groupBy("degree").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(core == Map(k - 3 -> blocks, 2L -> blocks, 3L -> (k - 5) * blocks),
      s"kcore degree histogram $core, want {${k - 3}: $blocks, 2: $blocks, " +
        s"3: ${(k - 5) * blocks}}")

    // personalized PageRank seeded at the centers: teleport mass returns
    // only to hubs, so after 3 iterations every center must out-rank
    // every member, and the integer mass obeys the same floor-loss bound
    // as pagerank (floors only destroy)
    val ppr = t("ppr-3") {
      Graph.personalizedPagerank(edges,
          spark.range(0, n, k, spark.sparkContext.defaultParallelism)
            .select(col("id").as("node")),
          iterations = 3)
        .withColumn("c", col("node") % k === 0)
        .groupBy("c").agg(count(lit(1)).as("cnt"),
          sum("rank_scaled").as("mass"),
          min("rank_scaled").as("lo"), max("rank_scaled").as("hi"))
        .collect().map(r => r.getBoolean(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    }
    val (pcCnt, pcMass, pcLo, _) = ppr(true)
    val (piCnt, piMass, _, piHi) = ppr(false)
    assert(pcCnt == blocks, s"ppr centers $pcCnt, want $blocks")
    val pprMass = pcMass + piMass
    assert(pprMass <= 1000000000000L && pprMass > 1000000000000L - 16 * n,
      s"ppr mass $pprMass out of bounds")
    assert(pcLo > piHi,
      s"a member out-ranked a seed center: centers ≥ $pcLo, members ≤ $piHi")
    println(s"  ppr rows ${pcCnt + piCnt}, mass $pprMass " +
      s"(loss ${1000000000000L - pprMass})")

    // harmonic closeness from the centers, 1 hop: every non-center is 1
    // hop from its own center (star edge), and the block's LAST node
    // (≡ k−1 mod k) additionally touches the next center via its ring
    // edge — so the result histogram has an exact closed form, and the
    // centers themselves never appear (no seed is adjacent to a center,
    // and the d=0 self-term is excluded by construction)
    val clo = t("closeness-1") {
      Graph.harmonicCloseness(edges,
          spark.range(0, n, k, spark.sparkContext.defaultParallelism)
            .select(col("id").as("node")),
          maxHops = 1)
        .groupBy("n_seeds_reached", "harmonic")
        .agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    assert(clo == Map((1L, 1000000L) -> (n - 2 * blocks),
        (2L, 2000000L) -> blocks),
      s"closeness histogram $clo, want {(1,1000000): ${n - 2 * blocks}, " +
        s"(2,2000000): $blocks}")

    // directed SCC at scale: planted 8-node directed cycles (one SCC per
    // block) bridged 0 → every block head — a 2-level condensation, so
    // the peeling loop must finish in exactly 2 peels no matter how many
    // blocks there are, and every label has the closed form node−node%8
    val n2 = math.min(n, 512000L)
    val blocks2 = n2 / 8
    val cyc = spark.range(0, n2).select(col("id").as("src"),
      (col("id") - (col("id") % 8) + ((col("id") + 1) % 8)).as("dst"))
    val bridges = spark.range(1, blocks2)
      .select(lit(0L).as("src"), (col("id") * 8).as("dst"))
    val dedges = cyc.unionByName(bridges).localCheckpoint()
    val sccRow = t("scc") {
      Graph.scc(dedges, maxPeels = 5, maxHops = 40, entryHandoff = false)
        .agg(count(lit(1)).as("n"),
          sum(when(col("scc") === col("node") - (col("node") % 8), 1L)
            .otherwise(0L)).as("ok"))
        .collect().head
    }
    assert(sccRow.getLong(0) == n2 && sccRow.getLong(1) == n2,
      s"scc: ${sccRow.getLong(1)}/${sccRow.getLong(0)} labels correct, " +
        s"want $n2/$n2")
    println(s"  scc $n2 nodes, ${n2 + blocks2 - 1} edges, " +
      s"$blocks2 components — all labels exact")

    // deep singleton chain (round 9): 200k nodes in topological id
    // order — the exact shape whose diameter used to blow the forward
    // fixpoint (it needs n hops); the functional fast path must resolve
    // it in ~log₂(n) pointer-doubling rounds, labels = all singletons
    // (the closure oracle for a path is closed-form)
    val nc = 200000L
    val chain = spark.range(0, nc - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
      .localCheckpoint()
    val chainRow = t("scc-deep-chain") {
      Graph.scc(chain, maxPeels = 5, maxHops = 40, entryHandoff = false)
        .agg(count(lit(1)).as("n"),
          sum(when(col("scc") === col("node"), 1L).otherwise(0L)).as("ok"))
        .collect().head
    }
    assert(chainRow.getLong(0) == nc && chainRow.getLong(1) == nc,
      s"deep chain: ${chainRow.getLong(1)}/${chainRow.getLong(0)} singleton " +
        s"labels, want $nc/$nc")
    // same depth as a ring: ONE component, min label 0 everywhere
    val ring = chain.unionByName(
      spark.range(1).select(lit(nc - 1).as("src"), lit(0L).as("dst")))
      .localCheckpoint()
    val ringRow = t("scc-deep-ring") {
      Graph.scc(ring, maxPeels = 5, maxHops = 40, entryHandoff = false)
        .agg(count(lit(1)).as("n"),
          sum(when(col("scc") === 0L, 1L).otherwise(0L)).as("ok"))
        .collect().head
    }
    assert(ringRow.getLong(0) == nc && ringRow.getLong(1) == nc,
      s"deep ring: ${ringRow.getLong(1)}/${ringRow.getLong(0)} labels = 0, " +
        s"want $nc/$nc")
    println(s"  scc deep chain + ring at $nc nodes — functional fast path ok")

    // round-9 graph ops at scale, all closed-form:
    // (a) local clustering on 64k disjoint K8 cliques — every node d=7,
    //     T=21, lcc exactly 1.0
    val nb = 64000L
    val cliq = spark.range(0, nb).select(col("id").as("blk"))
      .select(explode(expr(
        """flatten(transform(sequence(0, 6), i ->
          |  transform(sequence(CAST(i AS BIGINT) + 1, 7), j ->
          |    struct(blk * 8 + i AS a, blk * 8 + j AS b))))""".stripMargin))
        .as("e"))
      .select(col("e.a"), col("e.b")).localCheckpoint()
    val lccRow = t("lcc-cliques") {
      Graph.localClustering(cliq)
        .agg(count(lit(1)).as("n"),
          sum(when(col("lcc") === 1.0 && col("degree") === 7L &&
            col("triangles") === 21L, 1L).otherwise(0L)).as("ok"))
        .collect().head
    }
    assert(lccRow.getLong(0) == nb * 8 && lccRow.getLong(1) == nb * 8,
      s"lcc: ${lccRow.getLong(1)}/${lccRow.getLong(0)} exact, want ${nb * 8}")
    // (b) 4-truss on the same cliques + 64k support-0 bridges between
    //     consecutive blocks: bridges peel in round 1, cliques survive
    //     with support exactly 6
    val bridges9 = spark.range(0, nb - 1)
      .select((col("id") * 8).as("a"), ((col("id") + 1) * 8).as("b"))
    val trussRow = t("ktruss-cliques") {
      Graph.trussPeel(cliq.unionByName(bridges9), k = 4, rounds = 2)
        .agg(count(lit(1)).as("n"),
          sum(when(col("support") === 6L, 1L).otherwise(0L)).as("ok"))
        .collect().head
    }
    assert(trussRow.getLong(0) == nb * 28 && trussRow.getLong(1) == nb * 28,
      s"ktruss: ${trussRow.getLong(1)}/${trussRow.getLong(0)} support-6 " +
        s"edges, want ${nb * 28}")
    // (c) betweenness on 64k disjoint 8-node stars, one seed leaf per
    //     star: every center carries δ = 6 (the 6 other leaves), every
    //     leaf 0 — per-seed state is 8 rows, so 64k seeds stay linear
    val stars = spark.range(0, nb).select(col("id").as("blk"))
      .select(explode(expr(
        "transform(sequence(1, 7), i -> struct(blk * 8 AS a, blk * 8 + i AS b))"))
        .as("e"))
      .select(col("e.a"), col("e.b")).localCheckpoint()
    val seeds = spark.range(0, nb).select((col("id") * 8 + 1).as("node"))
    val bwRow = t("betweenness-stars") {
      Graph.betweenness(stars, seeds, maxHops = 3)
        .agg(count(lit(1)).as("n"),
          sum(when(col("node") % 8 === 0 && col("betweenness") === 6.0, 1L)
            .otherwise(0L)).as("centers"),
          sum(when(col("node") % 8 =!= 0 && col("betweenness") === 0.0, 1L)
            .otherwise(0L)).as("leaves"))
        .collect().head
    }
    // reached per star: center + 6 non-seed leaves = 7 nodes
    assert(bwRow.getLong(0) == nb * 7 && bwRow.getLong(1) == nb &&
      bwRow.getLong(2) == nb * 6,
      s"betweenness: n=${bwRow.getLong(0)} centers=${bwRow.getLong(1)} " +
        s"leaves=${bwRow.getLong(2)}, want ${nb * 7}/$nb/${nb * 6}")
    println(s"  round-9 ops at ${nb * 8} nodes: lcc/ktruss/betweenness exact")

    println("ALL SCALE-GRAPH ASSERTIONS PASSED")
    spark.stop()
  }
}
