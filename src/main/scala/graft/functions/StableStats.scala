package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine bit-stable aggregate helpers.
  *
  * Naive `round(sum(x), 2)` / `round(avg(x), 2)` are NOT reproducible
  * across engines when the true decimal value can land on a half-unit
  * boundary: each engine accumulates in its own order, so the float it
  * rounds sits an ulp above or below the boundary nondeterministically.
  *
  * The fix: first collapse the engine's sum with `round(sum(x),
  * exactScale)` where `exactScale` is the number of decimals at which
  * the TRUE sum is exact (quantities: 0-2, prices: 2, price*(1-disc):
  * 4, charge with tax: 6). The true sum is never on a boundary at its
  * own exact scale, so every engine lands on the identical nearest
  * double. All further arithmetic (divide by count, scale to an output
  * precision) is then deterministic IEEE math on identical inputs, and
  * the final round behaves identically (Spark's HALF_UP and C++
  * round() are both half-away-from-zero for the values involved).
  *
  * Oracle SQL must mirror the same shape, e.g.
  * `round(round(sum(x), 4), 2)` / `round(round(sum(x), 4) / count(x), 2)`.
  *
  * Outputs stay DOUBLE (never DECIMAL): both engines land on the
  * bit-identical double after the final round, whereas DECIMAL output
  * makes the value hash depend on each engine's scale-string convention
  * (`133.50` vs `133.5`).
  */
object StableStats {

  /** Engine-stable sum: exact-scale inner round, then output round. */
  def stableSum(c: Column, exactScale: Int, outScale: Int = 2): Column =
    round(round(sum(c), exactScale), outScale)

  /** Engine-stable mean, rounded to `outScale`. */
  def stableAvg(c: Column, exactScale: Int, outScale: Int = 2): Column =
    round(round(sum(c), exactScale) / count(c), outScale)

  /** Engine-stable mean as the raw deterministic double (for downstream
    * comparisons that must agree with the oracle's identical expression). */
  def stableAvgRaw(c: Column, exactScale: Int): Column =
    round(sum(c), exactScale) / count(c)

  /** Engine-stable first and second moments: `sum(x)` exact at
    * `exactScale` decimals and `sum(x²)` exact at `2·exactScale` —
    * both land on the identical nearest double in every engine, so any
    * downstream variance/stddev arithmetic composed from them (same
    * operation order on both sides) is deterministic IEEE math. */
  def stableSumRaw(c: Column, exactScale: Int): Column =
    round(sum(c), exactScale)
  def stableSumSqRaw(c: Column, exactScale: Int): Column =
    round(sum(c * c), 2 * exactScale)
}

/** Deterministic engine-agnostic hashing for curation decisions. */
object DeterministicHash {

  /** md5-prefix uniform hash: a long in [0, 2³²) from
    * `md5("seed:" || x)`'s first 8 hex digits — the ONE definition
    * behind split assignment, source mixing, shard assignment,
    * quality sampling, and hashed classifier features. md5 (not
    * xxhash64) so ANY engine reproduces the decision; the DuckDB twin
    * is `('0x' || substr(md5('seed:' || x), 1, 8))::UBIGINT`. Keep a
    * single definition: any drift silently reassigns splits/shards
    * and breaks the oracle-parity contract of every caller. */
  def md5Prefix(seed: String, c: Column): Column =
    conv(substring(md5(concat_ws(":", lit(seed), c.cast("string"))), 1, 8), 16, 10)
      .cast("long")
}
