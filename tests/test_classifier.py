"""Pocket perceptron (operators/classifier.py): algorithm parity
against an independent pure-Python replica, convergence + early stop
on separable data, the pocket argmin on non-separable data, and the
map-side plan shapes. Cross-engine value parity is covered by the
registry differential
(tests/test_registry_oracle.py::ext_quality_perceptron)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ecommerce_lakehouse_platform_spark.operators import classifier

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("x", T.ArrayType(T.LongType())),
    ]
)


def _replica(rows, dim: int, n_iters: int):
    """Independent pure-Python pocket perceptron: same margin≤0
    update rule, same earliest-epoch argmin, same early stop."""
    w = [0] * dim
    hist = []
    for _ in range(n_iters + 1):
        mis = [
            (y, x)
            for _i, y, x in rows
            if y * sum(a * b for a, b in zip(x, w)) <= 0
        ]
        hist.append((len(mis), len(hist), list(w)))
        if len(hist) == n_iters + 1 or not mis:
            break
        for y, x in mis:
            for i in range(dim):
                w[i] += y * x[i]
    return min(hist)[2]


def _fit(spark, rows, n_iters=6):
    feats = spark.createDataFrame(rows, schema=_SCHEMA)
    return classifier.perceptron_fit(feats, dim=3, n_iters=n_iters)


# y = sign(x1 - 5·bias) with a wide gap (x1 ≤ 2 vs ≥ 8): batch
# epochs reach zero errors in 3 updates (verified by the replica —
# BATCH perceptron may cycle on narrowly separable data, where the
# classic convergence theorem only covers sequential updates)
_SEPARABLE = [
    (i, 1 if v >= 8 else -1, [1, v, (v * 7) % 5])
    for i, v in enumerate([0, 1, 2, 0, 8, 9, 10, 8, 2, 9])
]


def test_separable_converges_and_stops_early(spark):
    w = _fit(spark, _SEPARABLE, n_iters=12)
    # converged: zero training errors under the returned weights
    for _i, y, x in _SEPARABLE:
        assert y * sum(a * b for a, b in zip(x, w)) > 0
    # early stop: a zero-error epoch ends the run before 12 updates
    assert classifier.LAST_EPOCH_ERRORS[-1] == 0
    assert len(classifier.LAST_EPOCH_ERRORS) < 13
    assert w == _replica(_SEPARABLE, dim=3, n_iters=12)


# XOR-ish: not linearly separable — the pocket must return the best
# epoch, not the (oscillating) last one
_NONSEP = [
    (0, 1, [1, 0, 0]),
    (1, -1, [1, 0, 1]),
    (2, -1, [1, 1, 0]),
    (3, 1, [1, 1, 1]),
    (4, 1, [1, 2, 2]),
    (5, -1, [1, 2, 0]),
]


def test_pocket_returns_min_error_epoch(spark):
    w = _fit(spark, _NONSEP, n_iters=6)
    assert w == _replica(_NONSEP, dim=3, n_iters=6)
    errors = sum(
        1
        for _i, y, x in _NONSEP
        if y * sum(a * b for a, b in zip(x, w)) <= 0
    )
    # the returned vector's error count is the recorded minimum
    assert errors == min(classifier.LAST_EPOCH_ERRORS)
    # and strictly better than the zero model (epoch 0 counts all 6)
    assert errors < classifier.LAST_EPOCH_ERRORS[0]


def test_deterministic_across_runs_and_partitionings(spark):
    feats1 = spark.createDataFrame(_NONSEP, schema=_SCHEMA)
    feats2 = spark.createDataFrame(_NONSEP, schema=_SCHEMA).repartition(7)
    w1 = classifier.perceptron_fit(feats1, dim=3, n_iters=4)
    w2 = classifier.perceptron_fit(feats2, dim=3, n_iters=4)
    assert w1 == w2


def test_quality_features_centering(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat", 300), (2, "a b", 10)],
        schema="doc_id long, text string, n_chars long",
    )
    rows = {
        r["doc_id"]: (r["y"], r["x"])
        for r in classifier.quality_features(docs).collect()
    }
    # doc 1: 6 tokens, 5 distinct ("the" twice), 2 "the", n_chars≥300
    assert rows[1] == (
        1,
        [
            1,
            6 - classifier.CENTER_TOKENS,
            5 - classifier.CENTER_DISTINCT,
            2 - classifier.CENTER_THE,
        ],
    )
    assert rows[2][0] == -1


def test_scoring_is_map_side(spark):
    feats = spark.createDataFrame(_SEPARABLE, schema=_SCHEMA)
    plan = (
        classifier.perceptron_score(feats, [-4, 1, 0])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure projection: zero shuffles
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_epoch_gradient_is_one_bounded_aggregation(spark):
    feats = spark.createDataFrame(_SEPARABLE, schema=_SCHEMA)
    margin = (
        F.col("y") * classifier._dot_w(F.col("x"), [0, 0, 0])
    ).alias("_m")
    grad_plan = (
        feats.select("y", "x", margin)
        .filter(F.col("_m") <= 0)
        .select(
            F.posexplode(F.transform(F.col("x"), lambda v: v * F.col("y")))
        )
        .groupBy("pos")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("col").alias("g"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one pos-keyed exchange after the map-side partial aggregate
    assert grad_plan.count("Exchange") == 1
    assert "BatchEvalPython" not in grad_plan
    assert "ArrowEvalPython" not in grad_plan
