"""Reusable distributed operators the DataFrame API lacks first-class.

Everything here is a composition of built-in Spark operators (one shuffle
where one is required, broadcast where a side is small) — no RDDs, no
row-at-a-time Python in hot paths.
"""

from cognitive_score_bigdata_spark.operators.dedup import (
    minhash_candidate_pairs,
    minhash_sig_table,
    simhash_candidate_pairs,
    simhash_sketch,
)
from cognitive_score_bigdata_spark.operators.joins import (
    asof_join,
    latest_per_key,
    latest_per_key_agg,
)
from cognitive_score_bigdata_spark.operators.multimodal import (
    extract_features,
    frame_sample,
)
from cognitive_score_bigdata_spark.operators.similarity import (
    cosine_neardup_exact,
    cosine_neardup_lsh,
    cosine_topk_exact,
    cosine_topk_numpy,
    ivf_topk,
    signlsh_buckets,
)
from cognitive_score_bigdata_spark.operators.skew import (
    salted_join,
    salted_two_stage_agg,
    with_salt,
)

__all__ = [
    "asof_join",
    "cosine_neardup_exact",
    "cosine_neardup_lsh",
    "cosine_topk_exact",
    "cosine_topk_numpy",
    "extract_features",
    "frame_sample",
    "ivf_topk",
    "latest_per_key",
    "latest_per_key_agg",
    "minhash_candidate_pairs",
    "minhash_sig_table",
    "salted_join",
    "salted_two_stage_agg",
    "signlsh_buckets",
    "simhash_candidate_pairs",
    "simhash_sketch",
    "with_salt",
]
