package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the driver union-find
  * ([[IncrementalClusters.unionFindMinLabels]]) — the one piece of
  * imperative driver-side algorithm on the clusters fold's hot path.
  * The fixture specs cross-check it against the distributed CC on a
  * handful of shapes; this drives random graphs against a naive
  * min-label fixpoint (undisputed but O(V·E) — fine at test scale).
  * Pure function, no Spark session needed. Generators driven manually
  * with fixed seeds (scalatestplus is not in the offline cache — the
  * WindowPlannerSpec pattern). */
class UnionFindPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], minSuccessful: Int = 40)(body: A => Unit): Unit =
    (1 to minSuccessful).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(1234L + i)).foreach(body)
    }

  /** Naive fixpoint: every node's label starts as itself; repeatedly
    * propagate the min across each edge until nothing changes. */
  private def naiveMinLabels(edges: Array[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val lab = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    var changed = true
    while (changed) {
      changed = false
      edges.foreach { case (a, b) =>
        val m = math.min(lab(a), lab(b))
        if (lab(a) != m) { lab(a) = m; changed = true }
        if (lab(b) != m) { lab(b) = m; changed = true }
      }
    }
    lab.toMap
  }

  private val genEdges: Gen[Array[(Long, Long)]] = for {
    n <- Gen.choose(0, 120)                       // node-id space
    m <- Gen.choose(0, 300)                       // edge count
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, math.max(1L, n.toLong))
      b <- Gen.choose(0L, math.max(1L, n.toLong))
    } yield (a, b))
  } yield es.toArray

  test("unionFindMinLabels == naive min-label fixpoint on random graphs") {
    forAll(genEdges) { edges =>
      val got = IncrementalClusters.unionFindMinLabels(edges)
      val want = naiveMinLabels(edges)
      assert(got == want,
        s"diff on ${edges.length} edges: " +
          s"${(want.toSet diff got.toSet).take(5)} / ${(got.toSet diff want.toSet).take(5)}")
    }
  }

  test("star-contracted graphs (the fold's actual shape): hubs with huge ids merge to the min member") {
    // the micro graph is hub-contracted stars: srcs are corpus labels
    // or delta mins, dsts are delta ids — ids can exceed Int range at
    // 100 TB, so exercise the Long domain explicitly
    val base = 3_000_000_000L // > Int.MaxValue
    forAll(for {
      stars <- Gen.choose(1, 10)
      bridges <- Gen.choose(0, 5)
      starEdges <- Gen.sequence[List[List[(Long, Long)]], List[(Long, Long)]](
        (0 until stars).toList.map { s =>
          Gen.choose(1, 6).map(k =>
            (1 to k).toList.map(i => (base + s * 100L, base + s * 100L + i)))
        })
      bridgeEdges <- Gen.listOfN(bridges, for {
        a <- Gen.choose(0, stars - 1)
        b <- Gen.choose(0, stars - 1)
      } yield (base + a * 100L, base + b * 100L))
    } yield (starEdges.flatten ++ bridgeEdges).toArray, 30) { edges =>
      val got = IncrementalClusters.unionFindMinLabels(edges)
      assert(got == naiveMinLabels(edges))
      // every label is a member of its own component (min is attained)
      got.values.foreach(l => assert(got(l) == l))
    }
  }
}
