"""HyperLogLog sketch: accuracy, mergeability, distributed estimate."""

import numpy as np
import pytest


def test_hll_accuracy_and_merge():
    from naer_ray.stages.sketch import HyperLogLog

    a = HyperLogLog(12).add_many([f"u{i}" for i in range(10_000)])
    assert abs(a.estimate() - 10_000) / 10_000 < 0.08
    b = HyperLogLog(12).add_many([f"u{i}" for i in range(5_000, 15_000)])
    a.merge(b)
    assert abs(a.estimate() - 15_000) / 15_000 < 0.08


def test_hll_small_range_exactish():
    from naer_ray.stages.sketch import HyperLogLog

    h = HyperLogLog(12).add_many(["a", "b", "c", "a", "b"])
    assert round(h.estimate()) == 3


def test_distributed_approx_distinct(ray_session):
    import ray.data

    from naer_ray.stages.sketch import approx_distinct

    ds = ray.data.from_items([{"k": f"key{i % 2000}"} for i in range(20_000)])
    est = approx_distinct(ds, "k")
    assert abs(est - 2000) / 2000 < 0.08
