"""eyoc_tpu — a TPU-native framework for distant point-cloud registration.

Re-implements the full capability surface of EYOC ("Extend Your Own
Correspondences", CVPR 2024) as an idiomatic JAX/XLA/Pallas stack: see
DESIGN.md for the architecture and SURVEY.md for the structural analysis of
the reference this framework was built to match.
"""

__version__ = "0.1.0"


def extract_features(*args, **kwargs):
    """Lazy alias for :func:`eyoc_tpu.api.extract_features` (the reference's
    util/misc.py:21 user entry point)."""
    from eyoc_tpu.api import extract_features as _impl

    return _impl(*args, **kwargs)
