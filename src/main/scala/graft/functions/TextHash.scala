package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable text hashing.
  *
  * Everything downstream (MinHash, SimHash, fingerprints) needs a hash the
  * DuckDB oracle can reproduce bit-for-bit. md5 is identical everywhere;
  * the first 8 hex chars give an unsigned 32-bit value that fits safely in
  * int64 arithmetic in both engines (no overflow up to a 2^31 multiplier).
  */
object TextHash {

  /** 32-bit hash of a string column: int64 in [0, 2^32). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** A second, independent 32-bit hash (md5 hex chars 9-16) — paired with
    * [[hash32]] this yields 64 engine-portable hash bits per string without
    * a second digest pass. Kept as two int64 halves (never packed into one
    * signed 64-bit value): bit 63 would land on the sign bit, which DuckDB's
    * BIGINT shift arithmetic rejects and Spark's ANSI mode makes fragile.
    */
  def hash32hi(c: Column): Column =
    conv(substring(md5(c), 9, 8), 16, 10).cast("long")

  /** Whitespace-normalized lowercase md5 digest — THE exact-dedup identity
    * key, shared by every operator that groups "same document" (16-byte
    * shuffle keys instead of full text).
    */
  def normTextKey(c: Column): Column =
    md5(lower(trim(regexp_replace(c, "\\s+", " "))))

  /** Universal-hash family over hash32 values:
    * h_i(x) = (a_i·x + b_i) mod 4294967291 (largest 32-bit prime).
    * a_i = 37 + 12·i, b_i = 17 + 101·i — fixed so the oracle can inline them.
    */
  val MinhashPrime = 4294967291L
  def minhashConsts(n: Int): Seq[(Int, Long, Long)] =
    (0 until n).map(i => (i, 37L + 12L * i, 17L + 101L * i))

  /** 31^k mod (2^31 − 1) for k = 0..7 — positional weights for the
    * polynomial (Rabin-Karp-style) document fingerprint.
    */
  val FingerprintPrime = 2147483647L
  val Pow31: Seq[Long] =
    Seq(1L, 31L, 961L, 29791L, 923521L, 28629151L, 887503681L, 1742810347L)
}
