"""Pure-SQL surface for the math families: the density / transform /
utility functions registered as Spark SQL temporary functions.

Spark 4 SQL UDFs (``CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN
<expression>``) are macro-expanded at analysis time, so every ``hb_*``
call compiles into the SAME whole-stage-codegen expressions as the Column
API in `henbun_spark.densities` / `transforms` — zero Python workers in
the plan (provable: a constant-argument call constant-folds to a literal
in the physical plan). This hands the reference's math surface
(`/root/reference/Henbun/densities.py`, `transforms.py:63-131`) to users
who live entirely in ``spark.sql(...)``.

Scale note: because the functions are macros, Catalyst sees the raw
arithmetic — predicate pushdown, constant folding, and common-
subexpression elimination all apply through an ``hb_*`` call; none of
that survives a black-box Python UDF.

Families needing lgamma (poisson/gamma/beta/student-t) are NOT mirrored
here: Spark SQL has no lgamma builtin, and inlining the Lanczos series as
a macro would diverge bitwise from the Column path's implementation — use
the Column API (`densities.poisson` et al.) for those.
"""

from __future__ import annotations

import numpy as np

_HALF_LOG_2PI = repr(0.5 * float(np.log(2.0 * np.pi)))

# name -> (typed parameter list, body expression). Bodies use D-suffixed
# double literals: a bare `1.0` parses as DECIMAL(2,1) in Spark SQL and
# would drag the expression through decimal promotion rules.
SQL_FUNCTIONS: dict[str, tuple[str, str]] = {
    # densities (log-pdfs), arg order matching henbun_spark.densities
    "gaussian": (
        "(x DOUBLE, mu DOUBLE, var DOUBLE)",
        f"-{_HALF_LOG_2PI}D - 0.5D * ln(var) - 0.5D * (mu - x) * (mu - x) / var",
    ),
    "lognormal": (
        "(x DOUBLE, mu DOUBLE, var DOUBLE)",
        f"-{_HALF_LOG_2PI}D - 0.5D * ln(var)"
        " - 0.5D * (mu - ln(x)) * (mu - ln(x)) / var - ln(x)",
    ),
    "bernoulli": (
        "(p DOUBLE, y DOUBLE)",
        "CASE WHEN y = 1.0D THEN ln(p) ELSE ln(1.0D - p) END",
    ),
    "exponential": ("(lamb DOUBLE, y DOUBLE)", "-y / lamb - ln(lamb)"),
    "laplace": (
        "(mu DOUBLE, sigma DOUBLE, y DOUBLE)",
        "-abs(mu - y) / sigma - ln(2.0D * sigma)",
    ),
    "bimixture": (
        "(f DOUBLE, p0 DOUBLE, p1 DOUBLE)",
        # stable LSE of (p0 + ln f, p1 + ln(1-f)) — same op order as
        # densities.bimixture's Column path
        "greatest(p0 + ln(f), p1 + ln(1.0D - f))"
        " + ln(exp(p0 + ln(f) - greatest(p0 + ln(f), p1 + ln(1.0D - f)))"
        "      + exp(p1 + ln(1.0D - f) - greatest(p0 + ln(f), p1 + ln(1.0D - f))))",
    ),
    # transforms (forward maps), matching henbun_spark.transforms
    "softplus": (
        "(x DOUBLE)",
        "greatest(x, 0.0D) + ln(1.0D + exp(-abs(x)))",
    ),
    "log1pe": (
        "(x DOUBLE)",
        # Log1pe.forward with the default lower=1e-6 shift
        "greatest(x, 0.0D) + ln(1.0D + exp(-abs(x))) + 1e-6D",
    ),
    "sigmoid": ("(x DOUBLE)", "1.0D / (1.0D + exp(-x))"),
    "logistic": (
        "(x DOUBLE, vmin DOUBLE, vmax DOUBLE)",
        "vmin + (vmax - vmin) / (1.0D + exp(-x))",
    ),
    # utilities (utils.py W2/W3 shapes)
    "clip": ("(x DOUBLE, lo DOUBLE, hi DOUBLE)", "least(greatest(x, lo), hi)"),
    "logsumexp2": (
        "(a DOUBLE, b DOUBLE)",
        "greatest(a, b) + ln(exp(a - greatest(a, b)) + exp(b - greatest(a, b)))",
    ),
}


def register_sql_functions(spark, prefix: str = "hb_") -> list[str]:
    """Register every entry as a session-scoped SQL function named
    ``{prefix}{name}``. Idempotent (CREATE OR REPLACE). Returns the list
    of registered function names."""
    names = []
    for name, (sig, body) in SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {prefix}{name}{sig} "
            f"RETURNS DOUBLE RETURN {body}"
        )
        names.append(f"{prefix}{name}")
    return names
