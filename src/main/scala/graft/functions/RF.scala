package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar/vector function library mirroring the reference's operator
  * semantics (SURVEY.md §2.2/§2.8) as codegen-friendly `Column`
  * expressions — no UDFs.
  *
  * Semantics pinned by the reference:
  *  - `/` on integers is Euclidean (floor) division with div-by-zero → null
  *    (`/root/reference/core/ops.h:171-183`).
  *  - `%` is Euclidean remainder (sign follows divisor).
  *  - `xbar` rounds down to a bucket width — the time/value bucketing
  *    primitive (`/root/reference/core/math.c:1635`).
  *  - `like` is a glob matcher: `*`, `?`, `[set]`
  *    (`/root/reference/core/string.c:417-520`).
  *  - `within` is an inclusive range test (`/root/reference/core/items.c:848`).
  *  - `round` is half-away-from-zero (`/root/reference/core/ops.h:199-201`);
  *    Spark's `round` (BigDecimal HALF_UP) already matches.
  */
object RF {

  /** Euclidean (floor) division; divisor 0 or null → null. Result is
    * integral (LongType) for any numeric operands — the reference's `/`
    * returns an integer even for float divisors
    * (`(/ -5 -0.60)` = `8`, `/root/reference/tests/lang.c:437`). */
  def euclidDiv(a: Column, b: Column): Column = {
    val d = when(b === 0, lit(null)).otherwise(b)
    floor(a.cast("double") / d.cast("double")) // floor() is LongType
  }

  /** Euclidean remainder: a - floor(a/b)*b; sign follows the divisor,
    * result type follows the operands (`(% 11 5.0)` = `1.0`,
    * `/root/reference/tests/lang.c:1748`). */
  def euclidMod(a: Column, b: Column): Column = {
    val d = when(b === 0, lit(null)).otherwise(b)
    a - floor(a.cast("double") / d.cast("double")) * d
  }

  /** Round x down to a multiple of width w (reference `xbar`).
    * pmod keeps this exact for 64-bit values (no double round-trip —
    * ns timestamps exceed double's 2^53 exact-integer range). */
  def xbar(w: Column, x: Column): Column = x - pmod(x, w)

  /** xbar over doubles, staying in double space. */
  def xbarD(w: Column, x: Column): Column =
    floor(x / w) * w

  /** Inclusive range membership (reference `within`). */
  def within(x: Column, lo: Column, hi: Column): Column =
    x.between(lo, hi)

  /** Reference `take` on arrays with n beyond the length: CYCLES through
    * the source (`(take [1 2 3] 5)` = `[1 2 3 1 2]`; the docs build
    * symbol columns with `(take (concat …) n)` this way). Negative n
    * takes from the end (tail cycling backwards). */
  def takeCycle(arr: Column, n: Int): Column =
    if (n >= 0)
      transform(sequence(lit(0), lit(n - 1)),
        i => element_at(arr, pmod(i, size(arr)) + 1))
    else
      transform(sequence(lit(n), lit(-1)),
        i => element_at(arr, pmod(i, size(arr)) + 1))

  /** Reference glob `like` (`*`, `?`, `[set]`) translated to a Java regex
    * and evaluated with `rlike` (codegen'd). */
  def likeGlob(c: Column, pattern: String): Column =
    c.rlike(globToRegex(pattern))

  private[graft] def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          val close = glob.indexOf(']', i + 1)
          if (close < 0) { sb.append("\\[") }
          else {
            sb.append('[').append(glob.substring(i + 1, close).replace("\\", "\\\\"))
              .append(']')
            i = close
          }
        case ch if "\\.[]{}()<>*+-=!?^$|".indexOf(ch.toInt) >= 0 =>
          sb.append('\\').append(ch)
        case ch => sb.append(ch)
      }
      i += 1
    }
    sb.append('$').toString
  }

  /** Round-half-up at `scale` decimals computed ARITHMETICALLY:
    * floor(x·10^s + 0.5)/10^s. Spark's `round` re-parses the double's
    * shortest decimal repr (BigDecimal HALF_UP) while DuckDB rounds the
    * binary value — for tidy rationals (ratios of small ints) the two
    * disagree at the .xxxx5 boundary. This form evaluates bit-identically
    * in both engines given bit-identical input. Nonnegative inputs. */
  def roundBin(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * p + 0.5) / p
  }

  /** Null-skipping population standard deviation — the reference's `dev`
    * is population, not sample (`(dev [1i 2i])` = 0.5,
    * `/root/reference/core/aggr.c:2864`). */
  def dev(c: Column): Column = stddev_pop(c)

  /** Exact median — reference `med` (`/root/reference/core/math.c:2529`). */
  def med(c: Column): Column = median(c)

  /** Rank: 0-based dense position in sorted order (reference `rank`,
    * `/root/reference/core/order.c:505`). Whole-table analytic — pair with
    * a Window in queries. */
  // (expressed at query sites via row_number().over(...) - 1)
}
