"""Capture an xplane trace of one prototype forward loop."""
import sys
import jax
import jax.numpy as jnp

mod = sys.argv[1] if len(sys.argv) > 1 else "proto_brick3"
import importlib
m = importlib.import_module(mod)

# monkey-patch: run main's guts but wrap timed region in profiler
import time
import numpy as np

def run():
    # re-execute main body up to the loop; easiest: profile whole main
    with jax.profiler.trace("/tmp/jaxtrace"):
        m.main()

run()
print("trace done")
