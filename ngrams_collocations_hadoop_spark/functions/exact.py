"""Order-independent float aggregation — the engine's determinism idiom.

A double sum is accumulation-order dependent: Spark adds partial
aggregates in partition order, DuckDB serially, and window frames may
sum via segment trees — so `round(sum(x), k)` can land on either side
of a round boundary depending on who added what first. The driver's
correctness gate hashes the rounded TEXT, so a 1-ulp flip at a
boundary is a red row (observed: `rel_star_join` on an adversarial
corpus whose prices sit on .005 boundaries).

The idiom: quantize each ROW to an integer grid finer than the input's
decimal precision (`round(x * 1e6)` — exact for any input with ≤ 6
decimals, which covers every money/value column here), sum the
integers exactly in any order, and derive the float
ONCE with a single expression whose text is shared with the DuckDB
oracle. Per-row quantization uses round-to-nearest, not floor: the
grid matches the data's decimal precision, so nearest recovers the
intended decimal exactly (no systematic truncation bias). Nearest is
EMITTED as floor(x*unit + 0.5) — see `_qterm` — because round(DOUBLE)
takes Spark's per-row BigDecimal path while the floor form is pure
IEEE arithmetic, identical in both engines at every input including
grid halves (which ≤6-decimal data never produces anyway).

For sums of IRRATIONAL per-row terms (logs in BM25 / cross-entropy),
the same shape applies at a 1e12 grid with floor() — there is no
"intended decimal" to recover, floor is the established convention of
the repo's moment sums (zipf/kl/covariance), and the ≤1e-12/row
truncation is invisible at round-6 output.

Accumulator width: the 1e6-grid sums default to BIGINT, not
DECIMAL(38,0) — measured 2.1x whole-query cost for the decimal
aggregate on the star join vs 1.15x for the long (Spark's Decimal128
update path vs a primitive codegen add). A BIGINT micro-sum holds
±9.2e12 VALUE units per group; under ANSI Spark an overflow is a loud
error (DuckDB auto-promotes to HUGEINT), at which point the caller
switches that query to `huge="DECIMAL(38,0)"` explicitly. The 1e12-
grid irrational sums and moment squares (per-row terms ~1e13-1e16)
stay DECIMAL/HUGEINT — they overflow BIGINT at realistic group sizes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _unit_exp(unit: str) -> int:
    assert unit.startswith("1e"), unit
    return int(unit[2:])


def _grid_round(value_sql: str, scale: int, unit: str = "1e6") -> str:
    """Round a DOUBLE holding 1e^unit-grid integers to a 10^scale
    output, via floor((v + half)/D)/grid — NOT round(v/unit, scale):
    when the exact sum ends in exactly half a grid step (…50 micro at
    scale 4), the engines' round(x, n) algorithms disagree on the half
    (observed: Spark 36380.1118 vs DuckDB 36380.1117 from IDENTICAL
    integer sums). floor arithmetic on the grid value is exact in both
    engines for |v| < 2^53 and defines the half-case once (half
    rounds toward +inf). When the grid equals the output scale the
    division is exact as-is."""
    d = 10 ** (_unit_exp(unit) - scale)
    if d == 1:
        return f"CAST({value_sql} AS DOUBLE) / {unit}"
    return (f"floor((CAST({value_sql} AS DOUBLE) + {d // 2}) / {d}) "
            f"/ 1e{scale}")


def _qterm(expr: str, unit: str, fn: str) -> str:
    """Per-row quantization term text, shared by Spark and the oracle.

    fn="round" (nearest, the money/value default) is emitted as
    floor(x*unit + 0.5) rather than round(x*unit): the two agree
    everywhere except exact grid halves — which ≤6-decimal inputs
    never produce (see module doc) — but round(DOUBLE) takes Spark's
    BigDecimal HALF_UP path (an allocation per row; measured 1.32 s
    vs 0.36 s for the floor form summing 50M rows), while floor is
    pure IEEE arithmetic inside whole-stage codegen and bit-identical
    in every engine BY CONSTRUCTION, halves included (half toward
    +inf, the repo-wide convention of `_grid_round`/`ieee_round`).
    fn="floor" (the irrational-term grids) is unchanged.

    Magnitude envelope: the no-grid-halves argument holds only while
    |x|*unit stays well below 2^52 (|x| ≲ 4.5e9 at the 1e6 grid) —
    above that the double product x*unit can itself land exactly on
    k+0.5, where floor(+0.5) rounds negative halves toward +inf while
    a true nearest-round of the decimal would not. Both engines share
    this text so there is no cross-engine divergence, but callers
    feeding values beyond the envelope get the floor-half convention,
    not the input's decimal. All current grids (money/value columns,
    |x| < 1e7) sit far inside it."""
    if fn == "round":
        return f"floor(({expr}) * {unit} + 0.5E0)"
    return f"{fn}(({expr}) * {unit})"


def usum_sql(expr: str, scale: int = 4, unit: str = "1e6",
             huge: str = "BIGINT", fn: str = "round") -> str:
    """DuckDB text of the exact rounded sum (Spark twin: `usum`)."""
    s = f"sum(CAST({_qterm(expr, unit, fn)} AS {huge}))"
    return _grid_round(s, scale, unit)


def usum(expr: str, scale: int = 4, unit: str = "1e6",
         fn: str = "round", huge: str = "BIGINT") -> Column:
    """`round(sum(expr), scale)` computed exactly (see module doc)."""
    return F.expr(usum_sql(expr, scale, unit, huge=huge, fn=fn))


def uavg_sql(expr: str, scale: int = 6, unit: str = "1e6",
             huge: str = "BIGINT", fn: str = "round") -> str:
    """DuckDB text of the exact rounded average (Spark twin: `uavg`).
    count(expr) (not count(*)) so NULL rows are excluded exactly as
    avg() excludes them. The grid-mean S/n is rounded to an integer
    grid value with the same floor-half idiom as `_grid_round` (the
    quotient can land exactly on a half), then scaled out."""
    grid_mean = (f"floor(CAST(sum(CAST({_qterm(expr, unit, fn)} "
                 f"AS {huge})) AS DOUBLE) / count({expr}) + 0.5E0)")
    return _grid_round(grid_mean, scale, unit)


def uavg(expr: str, scale: int = 6, unit: str = "1e6",
         huge: str = "BIGINT", fn: str = "round") -> Column:
    """`round(avg(expr), scale)` computed exactly (see module doc)."""
    return F.expr(uavg_sql(expr, scale, unit, huge=huge, fn=fn))


def uwin_sql(expr: str, over: str, scale: int = 4, unit: str = "1e6",
             huge: str = "HUGEINT", fn: str = "round") -> str:
    """Windowed form of `usum_sql` for oracle texts: the quantized sum
    runs OVER the given window clause, the derivation is shared."""
    s = f"sum(CAST({_qterm(expr, unit, fn)} AS {huge})) OVER {over}"
    return _grid_round(s, scale, unit)


def uterm(expr: str, unit: str = "1e6", fn: str = "round",
          huge: str = "BIGINT") -> Column:
    """Per-row quantized integer term, for window/stream aggregation
    paths where the sum is applied separately (`F.sum(uterm(..)).over`
    or streaming state). Pair with `uderive` on the summed column."""
    return F.expr(f"CAST({_qterm(expr, unit, fn)} AS {huge})")


def uderive(col: str, scale: int = 4, unit: str = "1e6") -> Column:
    """Final float from an exactly-summed quantized column."""
    return F.expr(_grid_round(col, scale, unit))


# ---- portable rounding of a SHARED double expression -------------------
#
# round(x, k) itself is engine-divergent: Spark expands the double to
# exact BigDecimal and rounds HALF_UP, DuckDB rounds the scaled double,
# and they disagree whenever x's binary expansion sits at a k-decimal
# boundary. RATIONAL outputs (ratios of integers: jaccard, recall,
# pagerank, chi-square, conditional probabilities) land on exact
# boundaries with real probability — ln/sqrt-irrational outputs only
# with ~2^-52 probability. floor(x*10^k + 0.5)/10^k is pure IEEE
# arithmetic, bit-identical in every engine that computes the same x;
# it never yields -0.0, and the half rounds toward +inf (repo-wide
# convention). Magnitude guard: Spark's floor(DOUBLE) returns LONG, so
# x*10^k must stay under Long.MAX — above 4e9 a double's ulp already
# exceeds 1e-6, the rounding cannot move the value, and the branch
# emits the shared expression unrounded (still bit-identical).

def ieee_round_sql(expr: str, scale: int = 6) -> str:
    """Dialect-portable text of round(expr, scale) (see block doc)."""
    unit = f"1e{scale}"
    return (f"CASE WHEN abs(({expr})) < 4e9 "
            f"THEN floor(({expr}) * {unit} + 0.5E0) / {unit} "
            f"ELSE ({expr}) END")


def ieee_round(col: Column, scale: int = 6) -> Column:
    """Column form of ``ieee_round_sql`` — identical IEEE ops."""
    unit = float(10 ** scale)
    return (F.when(F.abs(col) < F.lit(4e9),
                   F.floor(col * F.lit(unit) + F.lit(0.5)) / F.lit(unit))
            .otherwise(col))
