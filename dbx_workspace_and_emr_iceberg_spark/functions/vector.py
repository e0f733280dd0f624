"""Reusable vector column expressions (JVM-side; no Python).

Shared by operators/similarity.py and the F4 array queries. All lambdas
compile to Catalyst expressions — interpreted (HOFs don't codegen), so
keep pass counts low: one zip_with + one aggregate per metric.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> F.Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a, b) -> F.Column:
    diff = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.sqrt(dot(diff, diff))
