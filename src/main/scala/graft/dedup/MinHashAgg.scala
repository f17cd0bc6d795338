package graft.dedup

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator computing a full minhash signature in ONE pass
  * (SURVEY §4: the promised custom `Aggregator` for signature merge).
  *
  * Input rows are pre-hashed shingles (`graft_dot`-style engine-portable
  * md5 longs are computed by the caller per hash function seed — here the
  * input is the seed-0 hash and the remaining family members derive by
  * cheap integer mixing, see [[MinHashAgg.mix]]); the buffer is the
  * running elementwise minimum — associative, commutative, and O(H) sized,
  * so partial aggregation bounds shuffle volume at |keys|×H regardless of
  * shingle count.
  *
  * Versus the relational explode(×H)+groupBy formulation
  * ([[Dedup.minhashSignatures]]): same asymptotics, but one pass over the
  * input and no row multiplication. The relational form remains the
  * oracle-checked one (its md5-per-seed family is SQL-mirrorable); this
  * aggregator is the throughput path and is property-tested for agreement
  * on min-semantics.
  */
class MinHashAgg(numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], h0: Long): Array[Long] = {
    var i = 0
    var h = h0
    while (i < numHashes) {
      if (h < buf(i)) buf(i) = h
      h = MinHashAgg.mix(h)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** Cheap 64-bit mixer (splitmix64 finalizer) deriving the hash family
    * from one base hash — standard minhash practice; full md5 per seed is
    * only needed where an SQL oracle must reproduce the value.
    */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & 0x7fffffffffffffffL
  }
}
