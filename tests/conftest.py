from __future__ import annotations

import os

import pytest

from sycl_jaccard_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # north-rule test gate: the suite must be green at BOTH parallelism
    # levels (N and 4N) — run once with SPARK_GRAFT_TEST_CPUS=8 (default)
    # and once with 32; results recorded in BENCH/BASELINE.md.
    cores = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    s = get_spark("tests", cores=cores, shuffle_partitions=cores)
    yield s
    s.stop()


def exact_jaccard(a: set, b: set) -> float:
    """NumPy/pure-Python oracle for the reference's K6 semantics."""
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else None


class UnionFind:
    """Driver-side oracle for connected components."""

    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            self.p[rb] = ra

    def labels(self) -> dict:
        return {x: self.find(x) for x in list(self.p)}
