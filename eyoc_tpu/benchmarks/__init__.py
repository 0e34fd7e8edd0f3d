from eyoc_tpu.benchmarks.descriptor_eval import (
    NpzPairLoader,
    classification_metrics,
    eval_descriptor_pairs,
    transformation_metrics,
)
