package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join split is the first line of defense and is enabled
  * everywhere in this engine; salting is the explicit fallback for the
  * cases AQE can't fix (e.g. a single hot key inside one task of a
  * stream-static join, or pre-AQE shuffle placement).
  *
  * Mechanics: the large side scatters each row into one of `buckets`
  * sub-keys; the small side is replicated `buckets` times so every
  * sub-key finds its match. Correctness is salt-value-independent —
  * asserted equal to the plain join in SkewJoinSpec.
  */
object SkewJoin {

  /** Inner/left salted join of `large` (skewed) with `small` on
    * large(largeKey) === small(smallKey). */
  def saltedJoin(large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String, buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // deterministic scatter: hash of the whole row spreads a hot key's
    // rows across buckets (rand() would break retry/replay determinism)
    val salted = large.withColumn("_salt",
      pmod(hash(large.columns.map(col): _*), lit(buckets)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    // keys must be side-qualified: an unqualified col(key) is ambiguous
    // whenever both sides share the column name (incl. largeKey == smallKey,
    // the common case)
    salted.join(replicated,
        salted("_salt") === replicated("_salt") &&
          salted(largeKey) === replicated(smallKey), joinType)
      .drop("_salt")
  }
}
