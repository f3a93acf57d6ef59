"""Semantic tests for the fixed-point batch-GD linear classifier —
Spark fit vs an independent pure-python mirror, plus learning and
validation behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from anendektos_spark.functions import classify

FP = classify.FP
WS = classify.WS


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // b
    return q if a >= 0 else -q


def _py_fit(X, Y, iters, lr_num, lr_den):
    n, d = len(X), len(X[0])
    W = [0] * d
    for _ in range(iters):
        G = [0] * d
        for xi, yi in zip(X, Y):
            r = yi * FP * WS - sum(x * w for x, w in zip(xi, W))
            for j in range(d):
                G[j] += xi[j] * r
        W = [w + _tdiv(g * lr_num, n * FP * FP * lr_den) for w, g in zip(W, G)]
    return W


# a tiny separable task: y = sign(first feature), second feature is noise
VECS = [
    (1, [0.5, 0.1]),
    (2, [0.4, -0.3]),
    (3, [-0.6, 0.2]),
    (4, [-0.2, -0.1]),
    (5, [0.3, 0.4]),
    (6, [-0.5, -0.4]),
]


def _emb_df(spark):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in VECS]
    )


def test_fit_matches_python_reference(spark):
    got = {
        r.vec_id: (r.target, r.margin_fp, r.pred, r.correct)
        for r in classify.fit_and_score(
            _emb_df(spark), iters=4, lr_num=2, lr_den=1, target_dims=1,
            cache=False,
        ).collect()
    }
    X = [[round(x * FP) for x in v] + [FP] for _, v in VECS]
    Y = [1 if xi[0] > 0 else -1 for xi in X]
    W = _py_fit(X, Y, iters=4, lr_num=2, lr_den=1)
    want = {}
    for (vid, _), xi, yi in zip(VECS, X, Y):
        m = sum(x * w for x, w in zip(xi, W))
        pred = 1 if m >= 0 else -1
        want[vid] = (yi, m, pred, pred == yi)
    assert got == want


def test_fit_learns_separable_task(spark):
    out = classify.fit_and_score(
        _emb_df(spark), iters=8, lr_num=2, lr_den=1, target_dims=1,
        cache=False,
    ).collect()
    assert all(r.correct for r in out)  # fully separable -> all correct


def test_quantize_intercept_and_target(spark):
    xq = classify.quantize_features(_emb_df(spark)).collect()
    by_id = {r.vec_id: r.x for r in xq}
    assert by_id[1] == [round(0.5 * FP), round(0.1 * FP), FP]
    assert all(r.x[-1] == FP for r in xq)
    no_int = classify.quantize_features(
        _emb_df(spark), add_intercept=False
    ).collect()
    assert all(len(r.x) == 2 for r in no_int)


def test_fit_validation(spark):
    df = _emb_df(spark)
    xq = classify.quantize_features(df)
    xy = xq.select("vec_id", "x", classify.derived_target(1).alias("y"))
    with pytest.raises(ValueError):
        classify.linear_fit(xy, dims=3, iters=0)
    with pytest.raises(ValueError):
        classify.linear_fit(xy, dims=3, lr_num=0)
    empty = xy.filter("vec_id < 0")
    with pytest.raises(ValueError):
        classify.linear_fit(empty, dims=3, cache=False)


def test_fit_partitioning_independence(spark):
    # integer sums are order-independent: same weights at any parallelism
    df = _emb_df(spark)
    xy1 = classify.quantize_features(df.coalesce(1)).select(
        "vec_id", "x", classify.derived_target(1).alias("y")
    )
    xy4 = classify.quantize_features(df.repartition(4)).select(
        "vec_id", "x", classify.derived_target(1).alias("y")
    )
    w1 = classify.linear_fit(xy1, dims=3, iters=3, cache=False)
    w4 = classify.linear_fit(xy4, dims=3, iters=3, cache=False)
    assert w1 == w4
