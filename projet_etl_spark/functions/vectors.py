"""Vector primitives for embedding similarity (dim-64 float arrays).

Dot products and norms are generated as explicit left-associated
64-term sums, in BOTH engines, from the same Python loop — so the
double arithmetic associates identically and cosine similarity is
bit-exact between Spark and the DuckDB oracle (float->double widening
is exact; IEEE sqrt/division are correctly rounded in both).

At 100 TB scale this brute-force form stays JVM-side inside
whole-stage codegen (one fused expression per pair, no Python, no
shuffle beyond the join that builds pairs); the IVF variant prunes
the candidate set before this expression runs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

DIM = 64


def spark_dot(a: str, b: str, dim: int = DIM) -> Column:
    terms = [
        F.element_at(F.col(a), i).cast("double")
        * F.element_at(F.col(b), i).cast("double")
        for i in range(1, dim + 1)
    ]
    return reduce(lambda x, y: x + y, terms)


def spark_norm2(a: str, dim: int = DIM) -> Column:
    terms = [
        F.element_at(F.col(a), i).cast("double")
        * F.element_at(F.col(a), i).cast("double")
        for i in range(1, dim + 1)
    ]
    return reduce(lambda x, y: x + y, terms)


def fold_dot(a: str, b: str) -> Column:
    """Same left-assoc dot product as ``spark_dot`` but as a
    zip_with + aggregate fold: equal bit-for-bit (0.0 + x == x, then
    identical term order), yet the expression tree is tiny — 64-term
    generated sums cost whole-stage codegen tens of seconds of
    compilation when a plan contains many of them (measured on the
    16-plane LSH signature)."""
    return F.aggregate(
        F.zip_with(
            F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def fold_norm2(a: str) -> Column:
    """``spark_norm2`` as a fold; see ``fold_dot``."""
    return fold_dot(a, a)


def sql_dot(a: str, b: str, dim: int = DIM) -> str:
    return " + ".join(
        f"{a}[{i}]::DOUBLE * {b}[{i}]::DOUBLE" for i in range(1, dim + 1)
    )


def sql_norm2(a: str, dim: int = DIM) -> str:
    return " + ".join(
        f"{a}[{i}]::DOUBLE * {a}[{i}]::DOUBLE" for i in range(1, dim + 1)
    )


def cosine(dot: Column, norm2_a: Column, norm2_b: Column) -> Column:
    return dot / (F.sqrt(norm2_a) * F.sqrt(norm2_b))
