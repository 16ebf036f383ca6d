package graft.operators

import graft.{Caching, SparkSpec}
import org.apache.spark.sql.functions._

/** Falsifiable verification of the connected-components propagation loop.
  *
  * The sf0.01 oracle corpus's Jaccard-0.8 edge set is dyads + one complete
  * triangle (judge-measured, r8) — zero transitive-only pairs — so the
  * `dedup_clusters` oracle row alone cannot distinguish the full pointer-
  * jumping fixpoint from its round-0 init (min of direct neighbors). These
  * specs plant the cases the oracle lacks: chains whose minimum label is
  * reachable only through MULTIPLE propagation rounds, with ids deliberately
  * non-monotone along the path so labels must actually travel.
  */
class DedupClustersSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("doc_a", "doc_b")
  }

  private def reps(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("planted non-monotone chain 3~1~4~2: label 1 reaches node 2 transitively") {
    // Path 3-1-4-2. Node 2's only direct neighbor is 4, so its round-0 init
    // is min(2, 4) = 2 — the correct rep 1 can ONLY arrive via propagation
    // through 4. A broken loop body leaves {2 -> 2} and splits the cluster.
    val cc = DedupClusters.connectedComponents(edges((3L, 1L), (1L, 4L), (4L, 2L)))
    val got = Caching.withCleanup(cc)(reps(cc))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("17-node ascending path needs multiple star rounds, one component") {
    // Path 1~2~...~17: a diameter-16 component — naive neighbor
    // propagation would take 16 rounds; alternating star rounds must
    // collapse it well within maxIter. All nodes must land on rep 1.
    val path = (1L until 17L).map(i => (i, i + 1))
    val cc = DedupClusters.connectedComponents(edges(path: _*))
    val got = Caching.withCleanup(cc)(reps(cc))
    assert(got.keySet === (1L to 17L).toSet)
    assert(got.values.forall(_ === 1L),
      s"every path node must reach the transitive min label 1; got $got")
  }

  test("id-scrambled 33-node path converges fast and fully (probe regression)") {
    // XOR-scramble breaks any correlation between id order and path
    // position — the layout where the r8 propagate+jump loop degraded to
    // ~1 hop/round (caught by the cc scale probe at 1000 nodes). The
    // alternating-star rounds must converge well under maxIter and land
    // every node on the global min.
    val scrambled = (0L until 32L).map(i => (i ^ 0x15L, (i + 1) ^ 0x15L))
    val cc = DedupClusters.connectedComponents(edges(scrambled: _*), maxIter = 12)
    val got = Caching.withCleanup(cc)(reps(cc))
    assert(got.keySet === (0L to 32L).map(_ ^ 0x15L).toSet)
    assert(got.values.forall(_ === 0L),
      s"all nodes must reach global min 0 (= 0x15 ^ 0x15); got $got")
  }

  test("two components stay separate: chain + disjoint dyad") {
    val cc = DedupClusters.connectedComponents(
      edges((3L, 1L), (1L, 4L), (10L, 12L)))
    val got = Caching.withCleanup(cc)(reps(cc))
    assert(got === Map(1L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 12L -> 10L))
  }

  test("maxIter=1 on a long path throws instead of returning split components") {
    val path = (1L until 17L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      DedupClusters.connectedComponents(edges(path: _*), maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("withCleanup unpersists the labels frame on success and on exception") {
    spark.catalog.clearCache()
    val cc = DedupClusters.connectedComponents(edges((5L, 2L), (2L, 9L)))
    val got = Caching.withCleanup(cc)(reps(cc))
    assert(got === Map(2L -> 2L, 5L -> 2L, 9L -> 2L))
    assert(spark.sharedState.cacheManager.isEmpty,
      "withCleanup must leave no cached frame behind")

    val cc2 = DedupClusters.connectedComponents(edges((7L, 3L)))
    intercept[RuntimeException] {
      Caching.withCleanup(cc2) { throw new RuntimeException("boom") }
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "withCleanup must unpersist on the exception path too")
  }

  test("randomized cross-check: 50 scrambled random graphs vs in-memory union-find") {
    // The planted-chain specs above pin KNOWN shapes; this falsifies the
    // star rewrite on shapes nobody thought of (the r2 monotone-minhash and
    // r9 scrambled-path bugs were both found by exactly this class of
    // test). 50 random graphs — varied size/density, ids XOR-scrambled so
    // id order carries no path information, ~5% self-loops to exercise the
    // singleton-label path — are offset into disjoint id ranges and
    // resolved in ONE connectedComponents call (components cannot cross
    // ranges, so one fixpoint checks all 50 graphs at once); ground truth
    // is a 20-line union-find over the same pairs.
    val rnd = new scala.util.Random(0xC0FFEEL)
    val all = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val expected = scala.collection.mutable.Map[Long, Long]()
    for (g <- 0 until 50) {
      val base = (g + 1) * 1000000L
      val n = 2 + rnd.nextInt(199) // 2..200 nodes
      val mask = rnd.nextInt(256) // injective XOR scramble (n <= 256)
      def id(i: Int): Long = base + (i ^ mask).toLong
      val m = 1 + rnd.nextInt(2 * n) // sparse fragments .. dense near-clique
      val pairs = Seq.fill(m) {
        val a = rnd.nextInt(n)
        val b = if (rnd.nextInt(20) == 0) a else rnd.nextInt(n)
        (id(a), id(b))
      }
      all ++= pairs
      // union-find ground truth: rep = min id per component
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      pairs.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.foreach(x => expected(x) = find(x))
    }
    val cc = DedupClusters.connectedComponents(edges(all.toSeq: _*))
    val got = Caching.withCleanup(cc)(reps(cc))
    assert(got === expected.toMap)
  }

  test("self-loop-only nodes get singleton labels; mixed self/real edges unaffected") {
    // node 6 appears ONLY as (6,6) — its label row must still exist
    // (rep = self); node 1 has a self-loop AND a real edge — the self-loop
    // must not perturb its component
    val cc = DedupClusters.connectedComponents(
      edges((6L, 6L), (1L, 1L), (3L, 1L)))
    val got = Caching.withCleanup(cc)(reps(cc))
    assert(got === Map(1L -> 1L, 3L -> 1L, 6L -> 6L))
  }

  test("dedup_clusters key: reps are cluster minima and survivors are exactly the reps") {
    val out = DedupClusters.dedupClusters(spark, sf0001).collect()
    val rep = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // representative is idempotent (rep of a rep is itself) and <= member id
    rep.foreach { case (id, r) =>
      assert(r <= id, s"rep $r must be the smallest id in $id's cluster")
      assert(rep(r) === r, s"rep $r must be its own representative")
    }
    out.foreach { r =>
      assert(r.getBoolean(2) === (r.getLong(0) === r.getLong(1)))
    }
    spark.catalog.clearCache()
  }
}
