package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash document fingerprint (SURVEY.md §2.B — dedup family).
  * Per token: xxhash64 → ±1 vote per bit position; the signature bit is
  * the vote sign. Near-duplicates differ in few bits, so candidate pairs
  * come from equal signatures (or small hamming distance via bit_count ^).
  * Pure built-in expressions — codegen-friendly, no UDF.
  */
object SimHash {
  val Bits = 32

  private val powers: Seq[Long] = Seq.tabulate(Bits)(i => 1L << i)

  /** 32-bit simhash of a whitespace-tokenized text column, as LongType. */
  def simhash(text: Column): Column = {
    val tokens = array_distinct(split(lower(trim(text)), " "))
    // votes(i) = sum over tokens of (bit i of xxhash64(token) ? +1 : -1)
    val votes = aggregate(
      tokens,
      array_repeat(lit(0), Bits),
      (acc, t) =>
        zip_with(acc,
          transform(typedlit(powers),
            p => when(xxhash64(t).bitwiseAND(p) =!= 0L, 1).otherwise(-1)),
          (a, b) => a + b))
    aggregate(
      zip_with(votes, typedlit(powers), (v, p) => when(v > 0, p).otherwise(lit(0L))),
      lit(0L), _ + _)
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
