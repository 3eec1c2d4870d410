"""Arrow-vectorized batch inference over embeddings.

The canonical model-scoring shape for a 100 TB feature store: ship
the model weights in the closure, stream Arrow batches through
mapInPandas, score with one numpy matmul per batch (no per-row
Python). The "model" here is a fixed deterministic linear probe
(weights derived from a closed-form sequence) so the exact same
score is expressible in SQL — the oracle checks the whole Arrow
path bit-for-bit, and a pytest compares it against the equivalent
JVM-expression plan.
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.functions.vectors import DIM
from projet_etl_spark.sources.tables import load_table

# deterministic "model": w_i = ((7i + 3) mod 11 - 5) / 10, i 1-based
WEIGHTS: list[float] = [((7 * i + 3) % 11 - 5) / 10.0 for i in range(1, DIM + 1)]
BIAS = 0.25

OUT_SCHEMA = "vec_id long, score double, positive boolean"


def _build_round6():
    """Factory for the rounding helper. The helper must be CREATED
    inside a function (qualname `_build_round6.<locals>...`) so
    cloudpickle ships it BY VALUE inside the scorer closure; a plain
    module-level function would pickle by reference and executors of
    an external driver (foreign cwd, projet_etl_spark not importable)
    would die with ModuleNotFoundError — same trap as the multimodal
    factories."""

    def round6_half_up(np, raw):
        """round(x, 6) with Spark/DuckDB semantics: HALF_UP on the
        value's SHORTEST DECIMAL representation (BigDecimal.valueOf),
        not on the binary double.

        The vectorized trunc(x*1e6 + 0.5*sign) formula operates on
        the binary product, which can land on the opposite side of
        .5 from the decimal representation when x is within ~1 ulp
        of a rounding boundary (ADVICE r3). So: numpy fast path for
        every row whose scaled fraction is safely away from .5, and
        an exact decimal-string quantize for the rare boundary rows.
        The margin (1e-12 relative) is ~1000x the worst accumulated
        double error of the scaling multiply, so no divergent row
        can slip through it, while in practice ~0 rows per batch
        take the slow path.
        """
        scaled = raw * 1e6
        fast = np.trunc(scaled + 0.5 * np.sign(raw)) / 1e6
        margin = np.maximum(np.abs(scaled) * 1e-12, 1e-9)
        risky = np.abs(np.mod(scaled, 1.0) - 0.5) <= margin
        risky &= np.isfinite(raw)
        if risky.any():
            from decimal import ROUND_HALF_UP, Decimal

            q = Decimal("0.000001")
            for j in np.nonzero(risky)[0]:
                fast[j] = float(
                    Decimal(repr(raw[j])).quantize(q, rounding=ROUND_HALF_UP)
                )
        return fast

    return round6_half_up


# module-level instance for direct (driver-side / test) callers
_round6_half_up = _build_round6()


def make_scorer(weights: list[float], bias: float):
    """Closure-shipped scorer (by-value pickling; see multimodal)."""
    _round6 = _build_round6()

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        w = np.asarray(weights, dtype=np.float64)
        for pdf in batches:
            m = np.stack(pdf["embedding"].map(lambda v: np.asarray(v, dtype=np.float64)))
            # accumulate column-by-column (left-assoc) so the float
            # addition order matches the SQL oracle exactly
            acc = np.zeros(len(pdf), dtype=np.float64)
            for i in range(m.shape[1]):
                acc = acc + m[:, i] * w[i]
            raw = acc + bias
            s = _round6(np, raw)
            yield _pd.DataFrame(
                {"vec_id": pdf["vec_id"], "score": s, "positive": s > 0}
            )

    return score


def q_embed_score_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-probe scores via the Arrow/pandas path."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInPandas(make_scorer(WEIGHTS, BIAS), schema=OUT_SCHEMA)


def q_embed_score_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same scores as a whole-stage-codegen JVM expression —
    the plan to prefer when the model is expressible; the pandas
    path exists for real (non-linear) models."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    terms = [
        F.element_at(F.col("embedding"), i).cast("double") * F.lit(WEIGHTS[i - 1])
        for i in range(1, DIM + 1)
    ]
    s = F.round(reduce(lambda a, b: a + b, terms) + F.lit(BIAS), 6)
    return emb.select(
        "vec_id", s.alias("score"), (s > 0).alias("positive")
    )
