"""Hardware benchmark — registered pairs/sec/chip, plus a capability check.

Phase A (timed): the full test-protocol pipeline (device voxelization ->
brick pyramid -> ResUNetBN2C features -> 5000-pt sample -> SC2-PCR
registration) on KITTI-scale synthetic LiDAR pairs at the hardest distance
split (d in [40, 50] m), ALL pairs inside ONE device program (`lax.map`) so
host/tunnel round-trip latency does not pollute the measurement.

Phase B (capability, time-budgeted, never blocks the JSON line): trains the
backbone supervised for ~90 steps on close synthetic pairs and reports the
registration-recall TREND at d in {10, 20, 30} m under the reference test
protocol (no rotation augmentation, lib/data_loaders.py:1824-1831) for
both the trained net and an untrained control — the distant-pair
capability the product exists for, in driver-visible form, with the
untrained numbers protocol-consistent with experiments/EXTENSION_DEMO.md.

Prints ONE JSON line:
  {"metric": "registered_pairs_per_sec_per_chip", "value": N,
   "unit": "pairs/s", "vs_baseline": N / 50.0, "extra": {...}}
Baseline: the BASELINE.json north star of >= 50 registered pairs/sec/chip.

--trace dumps a jax.profiler trace of the timed run to /tmp/jaxtrace_bench
(parse with parse_trace.py).
"""

import contextlib
import json
import sys
import time

import numpy as np

N_PAIRS = 16
RAW = 131072
# Sized to the raycast LiDAR workload (64-beam HDL-64E-like scans, real
# KITTI voxel statistics — SURVEY.md §5: ~130k raw pts -> 15-25k voxels at
# 0.3 m). Measured per-level maxima over the 16 bench pairs:
# [14615, 4539, 1343, 461]; caps carry 12-15% headroom.
CAPS = (16384, 5120, 1536, 512)
CAPABILITY_BUDGET_S = 300.0   # raycast scene gen costs ~3 s/pair of it


def _capability(t_deadline):
    """Train briefly, then eval the TEST protocol (no rotation, reference
    lib/data_loaders.py:1824-1831) at d in {10, 20, 30} m for BOTH the
    trained and the untrained net. Returns (rr dict, n_eval/dist, steps)
    or None on budget/error.

    Round-5 protocol fixes (verdict items 3 + weak 2): the old capability
    eval used phase="train" batches (rotation augmentation the reference
    test protocol never applies), a single distance, and re-built the
    SAME scene seed for every eval draw. Now: distinct held-out scenes
    per pair, per-distance RR trend, and an untrained control measured
    under the identical protocol so the bench's untrained number is
    comparable with experiments/EXTENSION_DEMO.md."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_raw_batch, _tiny_cfg
    from eyoc_tpu.data.datasets import SyntheticPairDataset
    from eyoc_tpu.data.loader import collate_items
    from eyoc_tpu.geometry.metrics import registration_success
    from eyoc_tpu.models import init_unet, load_model
    from eyoc_tpu.registration.sc2pcr import SC2PCRConfig
    from eyoc_tpu.training.steps import StepBuilder, StepConfig, init_train_state

    spec = load_model("ResUNetBN2C")
    raw, caps = 65536, (16384, 10240, 4096, 2048)
    step_cfg = StepConfig(
        spec=spec, caps=caps, voxel_size=0.3, conv1_kernel_size=5,
        num_pos=1024, num_hn_samples=256, knn_tile=2048,
        eval_sample_points=5000,
        sc2=SC2PCRConfig(max_points=5000, seed_cap=1000),
    )
    b = StepBuilder(step_cfg)
    train = b.make_base_train_step("gt")
    test = b.make_test_step(use_ransac=False)   # its own (smaller) compile
    params, bn = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)
    state = init_train_state(params, bn, jax.random.PRNGKey(1))
    cfg = _tiny_cfg(raw_point_capacity=raw, pair_min_dist=2, pair_max_dist=8)
    batches = [
        jax.tree_util.tree_map(
            jnp.asarray,
            _make_raw_batch(cfg, n_pairs=2, n_points=raw, dist=float(2 + i % 7)))
        for i in range(6)
    ]
    steps = 0
    while time.time() < t_deadline - 60 and steps < 90:
        state, _ = train(state, batches[steps % len(batches)], 0.1)
        steps += 1
    if steps < 20:
        return None
    # eval gets its own allowance past the training deadline: host-side
    # scene generation dominates eval wall time
    arms = {"trained": (state.params, state.bn_state),
            "untrained": (params, bn)}
    succ = {a: {} for a in arms}
    n_eval = {}
    for d in (10.0, 20.0, 30.0):
        ds = SyntheticPairDataset(
            "test", cfg, random_rotation=False, random_scale=False,
            n_pairs=6, n_points=raw, dist=d)
        ds.seed0 = 880000 + int(d) * 1000   # held-out, distinct per pair
        n_eval[d] = 0
        for i in range(6):
            if time.time() > t_deadline + 180:
                break
            eb = jax.tree_util.tree_map(
                jnp.asarray, collate_items([ds[i]], raw))
            for arm, (p, s) in arms.items():
                out = test(p, s, eb, jax.random.PRNGKey(100 + i))
                ok, _, _ = registration_success(out["T_est"], eb.T_gt[0])
                succ[arm].setdefault(d, []).append(int(ok))
            n_eval[d] += 1
    if not any(n_eval.values()):
        return None
    rr = {f"rr_{arm}_{int(d)}m": round(float(np.mean(v)), 3)
          for arm, per_d in succ.items() for d, v in per_d.items()}
    return rr, n_eval, steps


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_raw_batch, _tiny_cfg
    from eyoc_tpu.geometry.metrics import registration_success
    from eyoc_tpu.models import init_unet, load_model
    from eyoc_tpu.registration.sc2pcr import SC2PCRConfig
    from eyoc_tpu.training.steps import StepBuilder, StepConfig

    t_start = time.time()
    spec = load_model("ResUNetBN2C")
    step_cfg = StepConfig(
        spec=spec, caps=CAPS, voxel_size=0.3, conv1_kernel_size=5,
        knn_tile=2048, eval_sample_points=5000,
        sc2=SC2PCRConfig(max_points=5000, seed_cap=1000),
        # the test protocol applies no rotation augmentation (reference
        # lib/data_loaders.py:1824-1831), so LiDAR z stays within +-19 m
        # and xy within the 80 m scan range; the window drives the
        # transient neighbor-grid size ((10,10,7) = 268 MB memset per
        # cloud at L0; (9,9,7) quarters it and drops 0.02% of voxels on
        # the bench scenes — measured round 5, proto_bench_caps notes)
        window_bits=(9, 9, 7),
    )
    builder = StepBuilder(step_cfg)
    inner = builder.make_test_step(use_ransac=False)
    reg_only = builder.make_register_step(use_ransac=False)

    params, bn_state = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)

    cfg = _tiny_cfg(raw_point_capacity=RAW, pair_min_dist=40, pair_max_dist=50)
    # ONE dataset of N_PAIRS distinct scenes (a fresh 1-pair dataset per
    # batch would reuse scene seed 1000 and time N_PAIRS copies of the
    # same pair); leaves reshaped to [N_PAIRS, 1, ...] for the lax.map
    big = _make_raw_batch(cfg, n_pairs=N_PAIRS, n_points=RAW, dist=45.0,
                          phase="test")
    stacked = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[:, None], big)
    keys = jax.random.split(jax.random.PRNGKey(0), N_PAIRS)

    @jax.jit
    def run_all(params, bn_state, stacked, keys):
        def one(xs):
            b, k = xs
            out = inner(params, bn_state, b, k)
            ok, te, re = registration_success(out["T_est"], b.T_gt[0])
            return ok.astype(jnp.float32), out["rte"], out["rre"]

        oks, tes, res = jax.lax.map(one, (stacked, keys))
        return jnp.sum(oks), jnp.mean(tes), jnp.mean(res)

    # reg-only timing operands (reg cost is independent of feature values)
    kk = jax.random.PRNGKey(7)
    rx0 = jax.random.uniform(kk, (N_PAIRS, CAPS[0], 3)) * 80
    rf0 = jax.random.normal(kk, (N_PAIRS, CAPS[0], 32))
    rm = jnp.ones((N_PAIRS, CAPS[0]), bool)
    rkeys = jax.random.split(kk, N_PAIRS)

    @jax.jit
    def run_reg(rx0, rf0, rm, rkeys):
        def one(xs):
            x0, f0, m, k = xs
            T = reg_only(x0, f0, m, x0 + 0.1, f0 + 0.01, m, k)
            return jnp.sum(T[:1, :1])

        return jnp.sum(jax.lax.map(one, (rx0, rf0, rm, rkeys)))

    # compile + warmup (one full pass)
    out = run_all(params, bn_state, stacked, keys)
    succ = float(out[0])
    float(run_reg(rx0, rf0, rm, rkeys))

    # RTT floor (tiny program round trip). Compile ONCE first — a fresh
    # jit per probe measures ~0.27 s of compile, not the ~25 ms tunnel
    # round trip, and silently inflates pairs/s when subtracted.
    tiny = jax.jit(lambda x: jnp.sum(x))
    z8 = jnp.zeros(8)
    float(tiny(z8))
    t0 = time.perf_counter()
    for _ in range(4):
        float(tiny(z8))
    rtt = (time.perf_counter() - t0) / 4

    trace_ctx = contextlib.nullcontext()
    if "--trace" in sys.argv:
        import jax.profiler
        trace_ctx = jax.profiler.trace("/tmp/jaxtrace_bench")

    best = float("inf")
    with trace_ctx:
        for _ in range(3):
            t0 = time.perf_counter()
            out = run_all(params, bn_state, stacked, keys)
            succ = float(out[0])  # forces completion, one scalar D2H
            best = min(best, time.perf_counter() - t0)

    best_reg = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_reg(rx0, rf0, rm, rkeys))
        best_reg = min(best_reg, time.perf_counter() - t0)

    dt = max(best - rtt, 1e-9)
    reg_dt = max(best_reg - rtt, 1e-9)
    pps = N_PAIRS / dt

    cap = None
    try:
        cap = _capability(t_start + CAPABILITY_BUDGET_S + (time.time() - t_start))
    except Exception:
        cap = None

    extra = {
        "n_pairs": N_PAIRS,
        "wall_s": round(best, 3),
        "host_rtt_s": round(rtt, 4),
        "feat_ms_per_pair": round(1000 * (dt - reg_dt) / N_PAIRS, 2),
        "reg_ms_per_pair": round(1000 * reg_dt / N_PAIRS, 2),
        # RR of the TIMED phase (untrained net, hardest split d in [40,50] m)
        # — expected 0.0; this is a throughput workload, not the capability
        # protocol (see rr_{trained,untrained}_* below for that)
        "timed_rr_untrained_d40_50": succ / N_PAIRS,
        "device": str(jax.devices()[0]),
    }
    if cap is not None:
        rr, n_eval, steps = cap
        extra.update(rr)
        # continuity with BENCH_r0{1..4}: the 10 m trained number
        extra["synthetic_rr_trained_10m"] = rr.get("rr_trained_10m")
        extra["capability_eval_pairs"] = sum(n_eval.values())
        extra["capability_train_steps"] = steps
    print(json.dumps({
        "metric": "registered_pairs_per_sec_per_chip",
        "value": round(pps, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pps / 50.0, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
