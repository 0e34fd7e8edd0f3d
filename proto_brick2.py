"""Per-stage timing of the brick forward components."""
import time
import jax
import jax.numpy as jnp
import numpy as np
from proto_brick import halo6, halo6_w2, conv3, bn_relu, down_conv, up_conv, NBS, CH

def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.float32))

def bench(name, op, init, K=32, n=3):
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, K, lambda i, c: op(c), c)
    _force(run(init))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _force(run(init))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:52s} {best*1e6:10.1f} us", flush=True)
    return best

key = jax.random.PRNGKey(0)
total = 0.0

# halo+conv3 per level/channel config (counts: how many such convs in net)
configs = [
    ("L0 k5 Cin=1 (conv1)", NBS[0], 1, 32, 5, 1),
    ("L0 32->32", NBS[0], 32, 32, 3, 2),
    ("L0 64->64", NBS[0], 64, 64, 3, 2),
    ("L1 64->64", NBS[1], 64, 64, 3, 4),
    ("L2 128->128", NBS[2], 128, 128, 3, 2),
    ("L2 64->64", NBS[2], 64, 64, 3, 2),
    ("L3 256->256", NBS[3], 256, 256, 3, 2),
]
for name, NB, ci, co, k, cnt in configs:
    fb = jax.random.normal(key, (NB, 2, 2, 2, ci), jnp.bfloat16)
    nbr = jax.random.randint(key, (NB, 6), 0, NB)
    W = 0.1 * jax.random.normal(key, (k, k, k, ci, co), jnp.bfloat16)
    def op(c, k=k):
        fb, nbr, W = c
        H = halo6_w2(fb, nbr) if k == 5 else halo6(fb, nbr)
        o = conv3(H, W).astype(jnp.bfloat16)
        fb2 = fb.at[..., :min(ci, co)].add(o[..., :min(ci, co)])
        return (fb2, nbr, W)
    t = bench(f"halo+conv {name}", op, (fb, nbr, W))
    total += t * cnt

# halo alone L0 64ch
fb = jax.random.normal(key, (NBS[0], 2, 2, 2, 64), jnp.bfloat16)
nbr = jax.random.randint(key, (NBS[0], 6), 0, NBS[0])
def oph(c):
    fb, nbr = c
    H = halo6(fb, nbr)
    return (fb + H[:, 1:3, 1:3, 1:3], nbr)
bench("halo alone L0 64ch", oph, (fb, nbr))

# bn_relu L0 64ch
x = jax.random.normal(key, (NBS[0], 2, 2, 2, 64), jnp.float32)
occ = jax.random.uniform(key, (NBS[0], 8)) < 0.25
sc, bi = jnp.ones((64,)), jnp.zeros((64,))
def opb(c):
    x, = c
    y = bn_relu(x, occ, sc, bi)
    return (x + y.astype(jnp.float32),)
t = bench("bn_relu L0 64ch (f32 in)", opb, (x,))
total += t * 8  # ~8 L0-ish BNs

# down conv L0->L1 32->64
fb = jax.random.normal(key, (NBS[0], 2, 2, 2, 32), jnp.bfloat16)
W = 0.1 * jax.random.normal(key, (3, 3, 3, 32, 64), jnp.bfloat16)
parent = jax.random.randint(key, (NBS[0],), 0, NBS[1] * 8)
occ1 = jax.random.uniform(key, (NBS[1], 8)) < 0.25
def opd(c):
    fb, W = c
    o = down_conv(fb, nbr, W, parent, occ1, NBS[1])
    return (fb.at[..., :32].add(o.astype(jnp.bfloat16)[:NBS[0] // 1, ..., :32][:fb.shape[0]] if False else 0*fb[...,:0].sum()+fb), W)
# simpler dependency: add scalar
def opd(c):
    fb, W = c
    o = down_conv(fb, nbr, W, parent, occ1, NBS[1])
    s = o.reshape(-1)[:1].astype(jnp.bfloat16)
    return (fb + s, W)
t = bench("down_conv L0->L1 32->64", opd, (fb, W))
total += t * 3

# up conv L1->L0 128->64
fc = jax.random.normal(key, (NBS[1], 2, 2, 2, 128), jnp.bfloat16)
nbr_c = jax.random.randint(key, (NBS[1], 6), 0, NBS[1])
Wu = 0.1 * jax.random.normal(key, (3, 3, 3, 128, 64), jnp.bfloat16)
pf = jax.random.randint(key, (NBS[0],), 0, NBS[1])
of = jax.random.randint(key, (NBS[0],), 0, 8)
def opu(c):
    fc, Wu = c
    o = up_conv(fc, nbr_c, Wu, pf, of)
    s = o.reshape(-1)[:1].astype(jnp.bfloat16)
    return (fc + s, Wu)
t = bench("up_conv L1->L0 128->64", opu, (fc, Wu))
total += t * 3

# final 1x1s
x = jax.random.normal(key, (NBS[0], 8, 96), jnp.bfloat16)
w1 = jax.random.normal(key, (96, 64), jnp.bfloat16)
w2 = jax.random.normal(key, (64, 32), jnp.bfloat16)
def opf(c):
    x, = c
    y = jax.nn.relu(jnp.einsum("nkc,cd->nkd", x, w1, preferred_element_type=jnp.float32)).astype(jnp.bfloat16)
    z = jnp.einsum("nkc,cd->nkd", y, w2, preferred_element_type=jnp.float32)
    n = jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12
    return (x + (z / n).astype(jnp.bfloat16)[..., :1],)
t = bench("conv1_tr + final + l2norm", opf, (x,))
total += t
print(f"\nest. total from components: {total*1e3:.2f} ms")
