package graft.incremental

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-file KEY BLOOM FILTER for the snapshot manifest (opt-in via
  * [[SnapshotTable]]'s `keyBloomBits`): range stats prove a file COULD
  * hold a key; the bloom proves (probabilistically) it DOES NOT — so a
  * scattered point batch (readKeys, delete, merge) skips
  * range-overlapping files that never held its keys, the shape range
  * pruning alone cannot touch (a file spanning [1, 1000] always
  * "could" hold key 500). A false positive only costs the rewrite/read
  * range pruning would have paid anyway — correctness never depends on
  * the bloom.
  *
  * Mechanics: the bloom input is `xxhash64(key)` computed by Spark's
  * own hash expression in the SAME stage-time stats aggregate (one
  * extra agg column when enabled, zero when not); the prune side
  * re-derives the identical hash driver-side by evaluating the same
  * Catalyst expression over a literal — one hash implementation, no
  * cross-implementation drift. k=6 bit positions per key via standard
  * double hashing. Bits serialize as base64'd longs on a `b` manifest
  * line per file; readers that predate blooms ignore the line, files
  * without blooms stay conservatively unpruned.
  *
  * Sizing note (why opt-in): the bloom lives INLINE in the manifest —
  * `bits` bytes/8 per file, e.g. 2 KB at the 16384-bit default-ish
  * setting, ~10 bits/key for ~1.6k-key files at ~1% fpp. Inline keeps
  * vacuum/commit untouched and reads free, at the cost of manifest
  * growth proportional to file count — right for doc-grain stores
  * (thousands of files); a billion-file table wants sidecar index
  * files instead (the Delta/Iceberg bloom-index rung, out of scope). */
private[incremental] object KeyBloom {

  val K = 6

  /** The k bit positions for a key hash (double hashing; h2 forced odd
    * so the stride cycles the whole table). */
  private def eachPosition(hash: Long, bits: Int, k: Int)(f: Int => Unit): Unit = {
    val h2 = (hash >>> 32) | 1L
    var i = 0
    while (i < k) {
      val p = ((hash + i * h2) % bits + bits) % bits
      f(p.toInt)
      i += 1
    }
  }

  /** `k` comes from the manifest's `b` line — honoring the persisted
    * probe count keeps old blooms readable if K ever changes. */
  def contains(words: Array[Long], bits: Int, k: Int, hash: Long): Boolean = {
    var all = true
    eachPosition(hash, bits, k) { p => if ((words(p >> 6) & (1L << (p & 63))) == 0L) all = false }
    all
  }

  def encode(words: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    bb.asLongBuffer().put(words)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  def decode(s: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(s)
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  /** Typed aggregator folding key hashes into the bit words — runs as
    * one extra column in the stage-time per-file stats aggregate. */
  final class BloomAgg(bits: Int) extends Aggregator[Long, Array[Long], Array[Byte]] {
    override def zero: Array[Long] = new Array[Long](bits / 64)
    override def reduce(b: Array[Long], hash: Long): Array[Long] = {
      eachPosition(hash, bits, K) { p => b(p >> 6) |= 1L << (p & 63) }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(r.length * 8)
      bb.asLongBuffer().put(r)
      bb.array()
    }
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** The driver-side twin of the executor's `xxhash64(key)` column:
    * the SAME Catalyst expression evaluated over a literal. */
  def hashOf(value: Any, dt: org.apache.spark.sql.types.DataType): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal.create(value, dt)),
      42L) // the same default seed functions.xxhash64 plans with
      .eval(null).asInstanceOf[Long]
}
