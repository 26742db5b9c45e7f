"""Shared statistical scalar algebra — the inverse normal CDF (probit)
rendered from ONE coefficient table into three lockstep backends:

  * ``probit_col``  — a pyspark Column expression (whole-stage codegen,
    no UDF);
  * ``probit_sql``  — the identical formula as an ANSI-SQL string for
    DuckDB oracle twins;
  * ``probit_py``   — a plain-python mirror for unit tests.

All three evaluate Acklam's rational approximation (Peter Acklam,
"An algorithm for computing the inverse normal cumulative distribution
function", 2003 — public domain; relative error < 1.15e-9 over (0, 1))
with Horner folds written in the SAME association order, so the only
cross-engine divergence is the 1-ulp libm ``ln``/``sqrt`` wobble in the
tail branches — negligible for any aggregate consumer and covered by
the shared 1e-6 tie rule where per-row parity matters.

Used by ``corpus_stats.shapiro_francia`` for Blom normal scores
m_i = probit((i - 3/8) / (n + 1/4)).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# Acklam 2003 coefficients (public domain)
_A = (
    -3.969683028665376e01,
    2.209460984245205e02,
    -2.759285104469687e02,
    1.383577518672690e02,
    -3.066479806614716e01,
    2.506628277459239e00,
)
_B = (
    -5.447609879822406e01,
    1.615858368580409e02,
    -1.556989798598866e02,
    6.680131188771972e01,
    -1.328068155288572e01,
)
_C = (
    -7.784894002430293e-03,
    -3.223964580411365e-01,
    -2.400758277161838e00,
    -2.549732539343734e00,
    4.374664141464968e00,
    2.938163982698783e00,
)
_D = (
    7.784695709041462e-03,
    3.224671290700398e-01,
    2.445134137142996e00,
    3.754408661907416e00,
)
P_LOW = 0.02425  # branch boundary; P_HIGH = 1 - P_LOW


def _horner(coeffs, x, lit, mul, add):
    """((c0*x + c1)*x + c2)... — identical fold order in every backend."""
    acc = lit(coeffs[0])
    for c in coeffs[1:]:
        acc = add(mul(acc, x), lit(c))
    return acc


def _tail(q, lit, mul, add, div):
    """Rational tail form in q = sqrt(-2 ln p): num(q) / den(q)."""
    num = _horner(_C, q, lit, mul, add)
    den = add(mul(_horner(_D, q, lit, mul, add), q), lit(1.0))
    return div(num, den)


def _central(qc, r, lit, mul, add, div):
    """Central form: num(r)*q / den(r), r = q*q, q = p - 1/2."""
    num = mul(_horner(_A, r, lit, mul, add), qc)
    den = add(mul(_horner(_B, r, lit, mul, add), r), lit(1.0))
    return div(num, den)


def probit_col(p: Column) -> Column:
    """Inverse standard-normal CDF of ``p`` as pure Column algebra."""
    lit, mul, add = F.lit, (lambda a, b: a * b), (lambda a, b: a + b)
    div = lambda a, b: a / b  # noqa: E731
    q_lo = F.sqrt(F.lit(-2.0) * F.log(p))
    q_hi = F.sqrt(F.lit(-2.0) * F.log(F.lit(1.0) - p))
    qc = p - F.lit(0.5)
    r = qc * qc
    return (
        F.when(p < F.lit(P_LOW), _tail(q_lo, lit, mul, add, div))
        .when(
            p > F.lit(1.0 - P_LOW),
            F.lit(0.0) - _tail(q_hi, lit, mul, add, div),
        )
        .otherwise(_central(qc, r, lit, mul, add, div))
    )


def probit_sql(p_expr: str) -> str:
    """The identical formula as a SQL scalar over the expression string
    ``p_expr`` (referenced several times — pass a column name or a
    cheap expression, not a subquery)."""
    lit = lambda c: repr(float(c))  # noqa: E731
    mul = lambda a, b: f"({a} * {b})"  # noqa: E731
    add = lambda a, b: f"({a} + {b})"  # noqa: E731
    div = lambda a, b: f"({a} / {b})"  # noqa: E731
    p = f"({p_expr})"
    q_lo = f"sqrt((-2.0 * ln({p})))"
    q_hi = f"sqrt((-2.0 * ln((1.0 - {p}))))"
    qc = f"({p} - 0.5)"
    r = f"({qc} * {qc})"
    return (
        f"CASE WHEN {p} < {P_LOW!r} THEN {_tail(q_lo, lit, mul, add, div)} "
        f"WHEN {p} > {1.0 - P_LOW!r} THEN "
        f"(0.0 - {_tail(q_hi, lit, mul, add, div)}) "
        f"ELSE {_central(qc, r, lit, mul, add, div)} END"
    )


def probit_py(p: float) -> float:
    """Plain-python mirror (CPython libm)."""
    lit = float
    mul = lambda a, b: a * b  # noqa: E731
    add = lambda a, b: a + b  # noqa: E731
    div = lambda a, b: a / b  # noqa: E731
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1), got {p}")
    if p < P_LOW:
        return _tail(math.sqrt(-2.0 * math.log(p)), lit, mul, add, div)
    if p > 1.0 - P_LOW:
        return 0.0 - _tail(
            math.sqrt(-2.0 * math.log(1.0 - p)), lit, mul, add, div
        )
    qc = p - 0.5
    return _central(qc, qc * qc, lit, mul, add, div)
