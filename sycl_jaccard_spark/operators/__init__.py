from sycl_jaccard_spark.operators.normalize import (
    canonical_pairs,
    dedup_edges,
    drop_self_loops,
    invert_direction,
    symmetrize,
)
from sycl_jaccard_spark.operators.rowsum import degrees, volumes
from sycl_jaccard_spark.operators.graph_jaccard import jaccard_all_edges
from sycl_jaccard_spark.operators.pair_jaccard import (
    jaccard_pairs,
    jaccard_pairs_memberships,
    jaccard_pairs_weighted,
    jaccard_pairs_weighted_arrays,
)
from sycl_jaccard_spark.operators.collections import (
    collection_candidates,
    collection_clusters,
    collection_memberships,
    collection_minhash,
    collection_pair_jaccard,
    drop_fork_members,
)
from sycl_jaccard_spark.operators.ann import (
    cosine_topk,
    embedding_near_dups,
    ivf_candidates,
    lsh_cosine_candidates,
    train_ivf_centroids,
)
from sycl_jaccard_spark.operators.mixing import (
    deterministic_sample,
    leakage_safe_split,
    stratified_mix,
)
from sycl_jaccard_spark.operators.representatives import (
    QualityGate,
    deduplicate_corpus,
    select_representatives,
    training_set,
)
from sycl_jaccard_spark.operators.weighted_dedup import (
    idf_weighted_candidates,
    idf_weights,
    weighted_memberships,
    weighted_signatures,
)

__all__ = [
    "invert_direction",
    "symmetrize",
    "canonical_pairs",
    "drop_self_loops",
    "dedup_edges",
    "degrees",
    "volumes",
    "jaccard_all_edges",
    "jaccard_pairs",
    "jaccard_pairs_memberships",
    "collection_memberships",
    "collection_candidates",
    "collection_clusters",
    "collection_minhash",
    "collection_pair_jaccard",
    "drop_fork_members",
    "jaccard_pairs_weighted",
    "jaccard_pairs_weighted_arrays",
    "cosine_topk",
    "embedding_near_dups",
    "ivf_candidates",
    "lsh_cosine_candidates",
    "train_ivf_centroids",
    "QualityGate",
    "deduplicate_corpus",
    "deterministic_sample",
    "leakage_safe_split",
    "select_representatives",
    "stratified_mix",
    "training_set",
    "idf_weighted_candidates",
    "idf_weights",
    "weighted_memberships",
    "weighted_signatures",
]
