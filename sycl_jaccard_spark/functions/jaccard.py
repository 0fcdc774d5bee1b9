"""Jaccard coefficient column expressions — the reference's K6 kernel.

``jaccard.cpp:607-620`` (Jaccard_JwKernel): given per-pair intersection Wi and
size-sum Ws, the union is Wu = Ws - Wi and the score J = Wi / Wu. Unweighted:
Wi = |A∩B|, Ws = |A| + |B|. Weighted (``standalone_algorithms.hpp:52-69``):
Wi = Σ_{x∈A∩B} w(x), Ws = vol(a) + vol(b). Always double precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def jaccard_from_counts(inter: Column, size_a: Column, size_b: Column) -> Column:
    """J = |A∩B| / (|A| + |B| - |A∩B|); 0-denominator (both empty) -> null."""
    union = (size_a + size_b - inter).cast("double")
    return F.when(union > 0, inter.cast("double") / union)


def jaccard_of_arrays(a: Column, b: Column) -> Column:
    """Exact Jaccard of two array-typed set columns (arrays hold distinct
    elements). One codegen'd expression — the Spark analog of the reference's
    fused edge-centric kernel (``jaccard.cpp:702-743``)."""
    inter = F.size(F.array_intersect(a, b))
    return jaccard_from_counts(inter, F.size(a), F.size(b))


def weighted_jaccard_from_sums(wi: Column, vol_a: Column, vol_b: Column) -> Column:
    """Weighted J = Wi / (vol_a + vol_b - Wi)  (``jaccard.cpp:614-618``)."""
    wu = (vol_a + vol_b - wi).cast("double")
    return F.when(wu > 0, wi.cast("double") / wu)


def containment_from_counts(inter: Column, size_a: Column, size_b: Column) -> Column:
    """Containment score C = |A∩B| / min(|A|, |B|): ~1.0 when one set embeds
    the other even if the symmetric Jaccard is low — the acceptance rule of
    the substring (suffix-array analog) pass. 0-denominator -> null."""
    lo = F.least(size_a, size_b).cast("double")
    return F.when(lo > 0, inter.cast("double") / lo)
