package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round, signum}

/** Boundary-stabilized ROUND(·, 4) for oracle-compared doubles whose two
  * engine computations follow different floating-point paths (recursive vs
  * closed-form EWMA, shuffle-order sums vs SQL aggregates in PageRank /
  * DSIR weights). A raw value within 1 ulp of a .00005 half-way point
  * could round apart across engines; shifting by sign(x)·1e-9 BEFORE
  * rounding (identically on the Spark side and in the DuckDB oracle SQL)
  * moves every natural half-way value 1e-9 inside its bucket, so the two
  * engines agree unless their raw values straddle `boundary − 1e-9` — a
  * point no natural fixture value sits within ulp-distance of.
  *
  * The shift is sign-aware so exact half-way values keep rounding AWAY
  * from zero, which is what both engines already do (Spark HALF_UP on the
  * decimal repr, DuckDB half-away-from-zero on the binary double) — i.e.
  * current fixture outputs are unchanged. 1e-9 is ≫ the cross-engine
  * divergence (≤ ~1e-11 absolute for the magnitudes involved) and ≪ the
  * 5e-5 half-bucket, so it can never move a value across a full bucket.
  */
object StableRound {
  private val Eps = 1e-9

  /** Column form: `round(c + signum(c) * 1e-9, 4)`. */
  def col4(c: Column): Column = round(c + signum(c) * lit(Eps), 4)

  /** Driver/executor scalar form — same HALF_UP decimal rounding Spark's
    * `round` applies, on the same shifted value. */
  def dbl4(y: Double): Double =
    BigDecimal(y + math.signum(y) * Eps)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The identical shift spelled in DuckDB SQL, for oracle authors:
    * `ROUND(v + SIGN(v) * 0.000000001, 4)`. */
  val sqlForm: String = "ROUND(v + SIGN(v) * 0.000000001, 4)"
}
