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


def make_scorer(weights: list[float], bias: float):
    """Closure-shipped scorer (by-value pickling; see multimodal)."""

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
            # half-away-from-zero to match Spark F.round / DuckDB ROUND;
            # np.round is half-even and would split on exact midpoints
            raw = acc + bias
            s = np.trunc(raw * 1e6 + 0.5 * np.sign(raw)) / 1e6
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
