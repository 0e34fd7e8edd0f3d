from eyoc_tpu.ops.knn import masked_knn, masked_argmin
from eyoc_tpu.ops.matching import (
    ratio_test_weights,
    mutual_topk_matches,
    spatial_filter_mask,
    compact_matches,
    SimilarityTables,
    load_similarity_tables,
)
