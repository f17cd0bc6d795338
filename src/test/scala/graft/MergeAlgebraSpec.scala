package graft

import graft.dedup.MinHashAgg
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the merge algebra every distributed fit relies on
  * (SURVEY §5: associativity & commutativity of the merge `Aggregator`s —
  * the property the reference's model averaging assumed silently).
  * Spark may merge partial buffers in ANY grouping and order; these
  * properties are exactly what make that reordering invisible.
  */
class MergeAlgebraSpec extends AnyFunSuite {

  private def check(prop: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  private val agg = new MinHashAgg(8)
  private def sig(hs: Seq[Long]): Array[Long] =
    hs.foldLeft(agg.zero)((b, h) => agg.reduce(b.clone(), h))

  private val hashGen = Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))

  test("MinHashAgg merge is commutative, associative, idempotent") {
    check(Prop.forAll(hashGen, hashGen) { (xs, ys) =>
      val ab = agg.merge(sig(xs), sig(ys)).toSeq
      val ba = agg.merge(sig(ys), sig(xs)).toSeq
      ab == ba
    }, "commutativity")
    check(Prop.forAll(hashGen, hashGen, hashGen) { (xs, ys, zs) =>
      val l = agg.merge(agg.merge(sig(xs), sig(ys)), sig(zs)).toSeq
      val r = agg.merge(sig(xs), agg.merge(sig(ys), sig(zs))).toSeq
      l == r
    }, "associativity")
    check(Prop.forAll(hashGen) { xs =>
      agg.merge(sig(xs), sig(xs)).toSeq == sig(xs).toSeq
    }, "idempotence")
  }

  test("MinHashAgg: any partition of the input merges to the global signature") {
    val gen = for {
      xs <- Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))
      cut <- Gen.choose(0, xs.length)
    } yield (xs, cut)
    check(Prop.forAll(gen) { case (xs, cut) =>
      val (a, b) = xs.splitAt(cut)
      agg.merge(sig(a), sig(b)).toSeq == sig(xs).toSeq
    }, "partition invariance")
  }

  test("simhash vote merge: partial tallies sum to the global tally") {
    // votes are ±1 integer sums per bit — exact associative arithmetic;
    // the final sign only depends on the tally, so any partial grouping
    // yields the same signature
    val bits = 16
    def tally(hs: Seq[Long]): Seq[Long] =
      (0 until bits).map { j =>
        hs.map(h => if (((h >>> j) & 1L) == 1L) 1L else -1L).sum
      }
    val gen = for {
      xs <- Gen.listOf(Gen.choose(0L, (1L << 60) - 1))
      cut <- Gen.choose(0, xs.length)
    } yield (xs, cut)
    check(Prop.forAll(gen) { case (xs, cut) =>
      val (a, b) = xs.splitAt(cut)
      tally(a).zip(tally(b)).map { case (x, y) => x + y } == tally(xs)
    }, "tally partition invariance")
  }

  test("NB sufficient-stat merge: per-block count sums equal the global fit") {
    // multinomial NB state is (class, term) counts — integer sums, exact
    val rowGen = for {
      c <- Gen.oneOf("a", "b"); t <- Gen.oneOf("x", "y", "z")
    } yield (c, t)
    val gen = for {
      xs <- Gen.listOf(rowGen)
      cut <- Gen.choose(0, xs.length)
    } yield (xs, cut)
    def counts(rows: Seq[(String, String)]): Map[(String, String), Long] =
      rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    check(Prop.forAll(gen) { case (xs, cut) =>
      val (a, b) = xs.splitAt(cut)
      val merged = (counts(a).keySet ++ counts(b).keySet).map { k =>
        k -> (counts(a).getOrElse(k, 0L) + counts(b).getOrElse(k, 0L))
      }.toMap
      merged == counts(xs)
    }, "count-merge partition invariance")
  }

  test("moment merge: (n, Σx, Σx²) partials reconstruct the global variance") {
    // Gaussian NB / VarianceThreshold state; double sums are order-
    // sensitive, so the property is at tolerance — the operators round
    // outputs far coarser than this bound
    val gen = for {
      xs <- Gen.nonEmptyListOf(Gen.choose(-1e3, 1e3))
      cut <- Gen.choose(0, xs.length)
    } yield (xs, cut)
    def m(rows: Seq[Double]): (Long, Double, Double) =
      (rows.size.toLong, rows.sum, rows.map(x => x * x).sum)
    check(Prop.forAll(gen) { case (xs, cut) =>
      val (a, b) = xs.splitAt(cut)
      val (n1, s1, q1) = m(a); val (n2, s2, q2) = m(b)
      val (n, s, q) = (n1 + n2, s1 + s2, q1 + q2)
      val (gn, gs, gq) = m(xs)
      n == gn && math.abs(s - gs) <= 1e-9 * (1 + math.abs(gs)) &&
        math.abs(q - gq) <= 1e-9 * (1 + math.abs(gq))
    }, "moment partition invariance")
  }

  test("block-averaged coefficient merge: permutation/pairing invariant") {
    // The splearn __add__ algebra LinearOps.blockAveragedLogisticGd /
    // blockAveragedOlsFit implement: an UNWEIGHTED mean over per-block
    // coefficient vectors. The mean is sum/k — invariant to block
    // order, and mergeable from any disjoint pairing of (sum, count)
    // partials (that pair IS the associative-commutative state; the
    // mean itself is only computed once at the end).
    val vecGen = Gen.nonEmptyListOf(Gen.choose(-1e3, 1e3))
    val gen = for {
      ws <- Gen.nonEmptyListOf(vecGen.map(_.take(4)))
      cut <- Gen.choose(0, ws.length)
    } yield (ws.map(_.padTo(4, 0.0)), cut)
    def mean(ws: Seq[Seq[Double]]): Seq[Double] =
      ws.transpose.map(c => c.sum / c.size)
    check(Prop.forAll(gen) { case (ws, cut) =>
      // permutation invariance (reversal = an odd permutation)
      val p1 = mean(ws).zip(mean(ws.reverse))
        .forall { case (a, b) => math.abs(a - b) <= 1e-9 * (1 + math.abs(a)) }
      // partial (sum, n) pairs merge to the global mean for any split
      val (a, b) = ws.splitAt(cut)
      def partial(s: Seq[Seq[Double]]): (Seq[Double], Long) =
        (s.transpose.map(_.sum) match {
          case Nil => Seq.fill(4)(0.0)
          case x => x
        }, s.size.toLong)
      val (sa, na) = partial(a); val (sb, nb) = partial(b)
      val merged = sa.zip(sb).map { case (x, y) => x + y }
        .map(_ / (na + nb))
      val p2 = merged.zip(mean(ws))
        .forall { case (m0, g) => math.abs(m0 - g) <= 1e-9 * (1 + math.abs(g)) }
      p1 && p2
    }, "block-average merge invariance")
  }
}
