from sycl_jaccard_spark.functions.shingles import (
    line_gram_hashes,
    md5_long,
    shingle_hashes,
    shingles,
    substring_band_hashes,
    tokens,
    winnow_hashes,
)
from sycl_jaccard_spark.functions.jaccard import (
    jaccard_from_counts,
    jaccard_of_arrays,
    weighted_jaccard_from_sums,
)
from sycl_jaccard_spark.functions.minhash import make_perms, minhash_udf
from sycl_jaccard_spark.functions.simhash import simhash_udf
from sycl_jaccard_spark.functions.suffix import lcs_bytes, pair_lcs, suffix_array

__all__ = [
    "md5_long",
    "tokens",
    "shingles",
    "shingle_hashes",
    "line_gram_hashes",
    "winnow_hashes",
    "substring_band_hashes",
    "jaccard_from_counts",
    "jaccard_of_arrays",
    "weighted_jaccard_from_sums",
    "make_perms",
    "minhash_udf",
    "simhash_udf",
    "suffix_array",
    "lcs_bytes",
    "pair_lcs",
]
