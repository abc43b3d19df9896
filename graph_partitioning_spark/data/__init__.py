"""Large-scale training-data pipeline operators.

Deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity
search over embedding columns (brute-force + bucketed ANN), text analysis
(token counts, quality scores, language id, fingerprints), and multimodal
binary-column plumbing. All hot paths are JVM-side built-ins / higher-order
functions; Python appears only in the Arrow-batched multimodal UDFs.
"""

from .decontam import (  # noqa: F401
    contamination,
    hash_split,
    with_split,
    word_ngrams,
)
from .pipeline import pretraining_funnel  # noqa: F401
from .dedup import (  # noqa: F401
    dedup_clusters,
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from .similarity import (  # noqa: F401
    ann_kmeans_topk,
    brute_force_topk,
    bucketed_topk,
    cosine_near_dup_pairs,
    hyperplane_signature,
    hyperplane_values,
    kmeans_quantizer,
)
from .textstats import (  # noqa: F401
    fingerprint,
    language_id,
    quality_scores,
    token_counts,
)
