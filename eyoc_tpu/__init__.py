"""eyoc_tpu — a TPU-native framework for distant point-cloud registration.

Re-implements the full capability surface of EYOC ("Extend Your Own
Correspondences", CVPR 2024) as an idiomatic JAX/XLA/Pallas stack: see
DESIGN.md for the architecture and SURVEY.md for the structural analysis of
the reference this framework was built to match.
"""

__version__ = "0.1.0"
