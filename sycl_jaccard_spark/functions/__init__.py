from sycl_jaccard_spark.functions.shingles import (
    md5_long,
    shingle_hashes,
    shingles,
    tokens,
)
from sycl_jaccard_spark.functions.jaccard import (
    jaccard_from_counts,
    jaccard_of_arrays,
    weighted_jaccard_from_sums,
)
from sycl_jaccard_spark.functions.minhash import make_perms, minhash_udf
from sycl_jaccard_spark.functions.simhash import simhash_udf

__all__ = [
    "md5_long",
    "tokens",
    "shingles",
    "shingle_hashes",
    "jaccard_from_counts",
    "jaccard_of_arrays",
    "weighted_jaccard_from_sums",
    "make_perms",
    "minhash_udf",
    "simhash_udf",
]
