package graft.dedup

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-buffer fused signature state: minhash mins and simhash votes
  * finish into the same (sig, simhash) struct the relational fused
  * aggregate emits.
  */
final case class FusedSig(sig: Array[Long], simhash: Long)

/** Typed Aggregator computing the ENTIRE fused signature — `numHashes`
  * minhash minima AND the `bits`-wide simhash majority tally — in one
  * primitive-array buffer per doc ([[Dedup.fusedSignatures]]'s 68-column
  * hash aggregate folded into a single ObjectHashAggregate state).
  *
  * Input per shingle row: the md5 seed-hash family array and the md5
  * prefix long — the SAME native-expression values the relational form
  * aggregates, so minima and votes (and therefore every oracle hash) are
  * bit-identical; only the aggregation plumbing differs. Buffer layout:
  * `[0, numHashes)` running minima (init Long.MaxValue), `[numHashes,
  * numHashes+bits)` vote counters (+1/-1 per shingle per bit). Both
  * reduce and merge are tight primitive loops; partial aggregation
  * (map-side combine) applies as usual, so shuffle volume stays
  * |docs| × (numHashes + bits) longs regardless of shingle count.
  */
class FusedSigAgg(numHashes: Int, bits: Int)
    extends Aggregator[(Seq[Long], Long), Array[Long], FusedSig] {
  require(numHashes >= 1 && bits >= 1 && bits <= 60,
    s"numHashes=$numHashes, bits=$bits out of range")

  override def zero: Array[Long] = {
    val a = new Array[Long](numHashes + bits)
    java.util.Arrays.fill(a, 0, numHashes, Long.MaxValue)
    a
  }

  override def reduce(buf: Array[Long], in: (Seq[Long], Long)): Array[Long] = {
    val mh = in._1
    var i = 0
    while (i < numHashes) {
      val h = mh(i)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    val sh = in._2
    var j = 0
    while (j < bits) {
      buf(numHashes + j) += (if ((sh & (1L << j)) != 0L) 1L else -1L)
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    var j = numHashes
    while (j < numHashes + bits) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): FusedSig = {
    var s = 0L
    var j = 0
    while (j < bits) {
      if (buf(numHashes + j) > 0L) s |= 1L << j
      j += 1
    }
    FusedSig(java.util.Arrays.copyOfRange(buf, 0, numHashes), s)
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[FusedSig] =
    ExpressionEncoder[FusedSig]()
}
