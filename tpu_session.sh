#!/bin/bash
# One-shot measurement batch for when the axon TPU tunnel is up.
# Order: reg-path A/B (decides defaults), train-step timing, honest bench.
set -u
cd /root/repo
# proto/ scripts import eyoc_tpu from the repo root; keep the existing
# PYTHONPATH (the axon TPU plugin loads from /root/.axon_site via it)
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"
echo "=== devices ==="
timeout 300 python -c "import jax; print(jax.devices())" || exit 1
echo "=== proto_reg_opt (SC2-PCR variant A/B) ==="
timeout 2400 python proto/proto_reg_opt.py 2>&1 | grep -v WARNING
echo "=== profile_train (supervised + EYOC extension step, bs=2) ==="
timeout 2400 python profile_train.py 2>&1 | grep -v WARNING
echo "=== bench.py ==="
timeout 2400 python bench.py 2>&1 | tail -2
