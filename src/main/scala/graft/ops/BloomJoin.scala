package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction: before shuffling a fact table into
  * an equi-join, drop the rows whose key cannot possibly match, using a
  * compact bitset built from the other side's keys — the classic
  * shuffle-volume reducer (Spark's own runtime row-level filtering,
  * `spark.sql.optimizer.runtimeFilter.bloomFilter.*`, applies the same
  * idea automatically but only under join-selectivity heuristics; this is
  * the explicit operator form a pipeline can pin).
  *
  * Exactness: the bloom pass only REMOVES definite non-matches (no false
  * negatives by construction); false positives survive the prefilter and
  * are eliminated by the real join that follows, so the composed result
  * is bit-identical to the plain join — the oracle for the driver query
  * IS the plain join.
  *
  * Scale shape: the bitset builds with one distributed aggregation
  * (positions explode → `bit_or` per 64-bit word, map-side combined),
  * collects at most `numBits/64` longs to the driver (128 KiB at the
  * 2²⁰-bit default — same KB-scale driver structure as the IVF
  * quantizer), and re-enters the plan as an array LITERAL: the probe is
  * pure codegen'd built-ins (xxhash64 + element_at + bit masks), no UDF,
  * no broadcast-variable closure, evaluated while scanning the fact side
  * — so the filter sits AT the scan, before the shuffle it exists to
  * shrink.
  */
object BloomJoin {

  /** Build the bitset: `k` xxhash64 probes per key into a `numBits`-wide
    * bit array, OR-combined per 64-bit word. */
  def bloomFilterBits(keys: DataFrame, key: String, numBits: Int, k: Int): Array[Long] = {
    require(numBits >= 64 && Integer.bitCount(numBits) == 1,
      s"numBits=$numBits must be a power of two >= 64")
    require(k >= 1 && k <= 16, s"k=$k hash probes out of range")
    val words = numBits / 64
    val positions = (0 until k).map(i =>
      pmod(xxhash64(col(key), lit(i)), lit(numBits.toLong)))
    val rows = keys
      .select(explode(array(positions: _*)).as("p"))
      .select((col("p") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("p") % 64).cast("int")).as("m"))
      .groupBy(col("w")).agg(bit_or(col("m")).as("bits"))
      .collect()
    val arr = new Array[Long](words)
    rows.foreach(r => arr(r.getAs[Int]("w")) = r.getAs[Long]("bits"))
    arr
  }

  /** Probe predicate over the literal bitset — true iff all `k` probe
    * bits are set (possibly present); false means definitely absent. */
  def mightContain(bloom: Array[Long], key: Column, numBits: Int, k: Int): Column = {
    val bl = typedlit(bloom.toSeq)
    (0 until k).map { i =>
      val p = pmod(xxhash64(key, lit(i)), lit(numBits.toLong))
      element_at(bl, (p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (p % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** Exact equi-join with the fact side bloom-prefiltered. `big` rows
    * failing the bitset never reach the join's shuffle; the join itself
    * restores exactness. Result ≡ `big.join(small, bigKey = smallKey)`. */
  def bloomJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      numBits: Int = 1 << 20, k: Int = 5): DataFrame = {
    val bloom = bloomFilterBits(small.select(smallKey), smallKey, numBits, k)
    big
      .filter(mightContain(bloom, col(bigKey), numBits, k))
      .join(small, col(bigKey) === col(smallKey))
  }
}
