"""Prototype: full ResUNetBN2C forward on the brick structure (perf only).

Fake-but-right-sized structure tables; real compute path: seq-6 halos,
conv3d, down/up convs, BN+relu, bf16 features. Measures t(K)/K honest.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.float32))


# per-level brick capacities (cloud saturating 32k voxels):
# bricks measured: 18592 / 7229 / 1723 / 469
NBS = (20480, 8192, 2048, 512)
CH = (32, 64, 128, 256)
TR = (64, 64, 64, 128)


def halo6(fb, nbr):
    """fb [NB,2,2,2,C] -> [NB,4,4,4,C] transitive seq-6 halo.
    nbr [NB,6]: x-lo, x-hi, y-lo, y-hi, z-lo, z-hi (sentinel NB -> zeros)."""
    NB = fb.shape[0]
    z = jnp.zeros((1,) + fb.shape[1:], fb.dtype)
    fbz = jnp.concatenate([fb, z], 0)

    def take(arr, idx):
        zz = jnp.zeros((1,) + arr.shape[1:], arr.dtype)
        return jnp.take(jnp.concatenate([arr, zz], 0), idx, axis=0)

    hx = jnp.concatenate([take(fb[:, 1:2], nbr[:, 0]), fb,
                          take(fb[:, 0:1], nbr[:, 1])], 1)
    hy = jnp.concatenate([take(hx[:, :, 1:2], nbr[:, 2]), hx,
                          take(hx[:, :, 0:1], nbr[:, 3])], 2)
    hz = jnp.concatenate([take(hy[:, :, :, 1:2], nbr[:, 4]), hy,
                          take(hy[:, :, :, 0:1], nbr[:, 5])], 3)
    return hz


def halo6_w2(fb, nbr):
    """Width-2 halo for k=5: [NB,2,2,2,C] -> [NB,6,6,6,C]."""
    def take(arr, idx):
        zz = jnp.zeros((1,) + arr.shape[1:], arr.dtype)
        return jnp.take(jnp.concatenate([arr, zz], 0), idx, axis=0)

    hx = jnp.concatenate([take(fb, nbr[:, 0]), fb, take(fb, nbr[:, 1])], 1)
    hy = jnp.concatenate([take(hx, nbr[:, 2]), hx, take(hx, nbr[:, 3])], 2)
    hz = jnp.concatenate([take(hy, nbr[:, 4]), hy, take(hy, nbr[:, 5])], 3)
    return hz


def conv3(H, W):
    """H [NB, X, Y, Z, Cin], W [3,3,3,Cin,Cout] VALID."""
    return jax.lax.conv_general_dilated(
        H, W, (1, 1, 1), "VALID",
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        preferred_element_type=jnp.float32)


def bn_relu(x, occ, scale, bias):
    """x [NB,2,2,2,C] f32; occ [NB,8] bool. Masked BN (inference-style here:
    compute batch stats) + relu, emitting bf16."""
    xf = x.reshape(x.shape[0], 8, x.shape[-1])
    m = occ[..., None].astype(jnp.float32)
    cnt = jnp.sum(m) + 1e-6
    mean = jnp.sum(xf * m, (0, 1)) / cnt
    var = jnp.sum((xf - mean) ** 2 * m, (0, 1)) / cnt
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    y = jax.nn.relu(y) * m
    return y.reshape(x.shape).astype(jnp.bfloat16)


def down_conv(fb, nbr, W, parent, occ_c, nb_coarse):
    """Stride-2 conv: fine bricks -> coarse cells via parent scatter.
    fb [NBf,2,2,2,C]; W [3,3,3,C,Co]; parent [NBf] index into coarse bricks;
    returns coarse cells [NBc,2,2,2,Co] f32."""
    H = halo6(fb, nbr)
    out1 = conv3(H[:, 0:3, 0:3, 0:3], W)[:, 0, 0, 0]       # [NBf, Co]
    NBc = nb_coarse
    cells = jnp.zeros((NBc * 8, out1.shape[-1]), jnp.float32)
    cells = cells.at[parent].add(out1, mode="drop")
    return cells.reshape(NBc, 2, 2, 2, -1)


def up_conv(fc, nbr_c, W, parent_f, octant_f):
    """Transposed conv s2: coarse bricks -> fine bricks.
    fc [NBc,2,2,2,Cin]; W [3,3,3,Cin,Co]; per-fine-brick parent index and
    flattened octant (0..7). Returns [NBf,2,2,2,Co] f32."""
    Hc = halo6(fc, nbr_c)                                   # [NBc,4,4,4,C]
    # dilated conv producing the 4^3 fine block per coarse brick
    out4 = jax.lax.conv_general_dilated(
        Hc[:, 0:3, 0:3, 0:3], W, (1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        lhs_dilation=(2, 2, 2),
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        preferred_element_type=jnp.float32)                 # [NBc,5,5,5,Co]
    out4 = out4[:, :4, :4, :4]
    NBc = fc.shape[0]
    Co = W.shape[-1]
    # regroup to octants [NBc, 8(oct), 8(cell), Co] then one take per fine brick
    o = out4.reshape(NBc, 2, 2, 2, 2, 2, 2, Co)             # x1 x0 y1 y0 ... no:
    # axes: [NBc, X(4), Y(4), Z(4), C]; X = 2*ox + cx
    o = out4.reshape(NBc, 2, 2, 2, 2, 2, 2, Co)             # ox,cx,oy,cy,oz,cz
    o = o.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(NBc * 8, 8 * Co)
    flat = parent_f * 8 + octant_f
    g = jnp.take(o, flat, axis=0)                           # [NBf, 8*Co]
    return g.reshape(-1, 2, 2, 2, Co)


def make_level(key, NB, C, n_coarse=None):
    ks = jax.random.split(key, 4)
    fb = jax.random.normal(ks[0], (NB, 2, 2, 2, C), jnp.bfloat16)
    nbr = jax.random.randint(ks[1], (NB, 6), 0, NB)
    occ = jax.random.uniform(ks[2], (NB, 8)) < 0.25
    return fb, nbr, occ


def main():
    key = jax.random.PRNGKey(0)
    L = 4
    nbrs, occs = [], []
    parents, octants = [], []
    for l in range(L):
        _, nbr, occ = make_level(jax.random.fold_in(key, l), NBS[l], CH[l])
        nbrs.append(nbr)
        occs.append(occ)
        if l + 1 < L:
            parents.append(jax.random.randint(
                jax.random.fold_in(key, 10 + l), (NBS[l],), 0, NBS[l + 1]))
            octants.append(jax.random.randint(
                jax.random.fold_in(key, 20 + l), (NBS[l],), 0, 8))

    # params
    def W(k, kk, ci, co):
        return 0.1 * jax.random.normal(jax.random.fold_in(key, k),
                                       (kk, kk, kk, ci, co), jnp.bfloat16)

    def bnp(c):
        return jnp.ones((c,)), jnp.zeros((c,))

    params = {
        "conv1": W(0, 5, 1, 32), "bn1": bnp(32),
        "b1a": W(1, 3, 32, 32), "bn1a": bnp(32),
        "b1b": W(2, 3, 32, 32), "bn1b": bnp(32),
        "conv2": W(3, 3, 32, 64), "bn2": bnp(64),
        "b2a": W(4, 3, 64, 64), "bn2a": bnp(64),
        "b2b": W(5, 3, 64, 64), "bn2b": bnp(64),
        "conv3": W(6, 3, 64, 128), "bn3": bnp(128),
        "b3a": W(7, 3, 128, 128), "bn3a": bnp(128),
        "b3b": W(8, 3, 128, 128), "bn3b": bnp(128),
        "conv4": W(9, 3, 128, 256), "bn4": bnp(256),
        "b4a": W(10, 3, 256, 256), "bn4a": bnp(256),
        "b4b": W(11, 3, 256, 256), "bn4b": bnp(256),
        "conv4tr": W(12, 3, 256, 64), "bn4t": bnp(64),
        "b3ta": W(13, 3, 64, 64), "bn3ta": bnp(64),
        "b3tb": W(14, 3, 64, 64), "bn3tb": bnp(64),
        "conv3tr": W(15, 3, 64 + 128, 64), "bn3t": bnp(64),
        "b2ta": W(16, 3, 64, 64), "bn2ta": bnp(64),
        "b2tb": W(17, 3, 64, 64), "bn2tb": bnp(64),
        "conv2tr": W(18, 3, 64 + 64, 64), "bn2t": bnp(64),
        "b1ta": W(19, 3, 64, 64), "bn1ta": bnp(64),
        "b1tb": W(20, 3, 64, 64), "bn1tb": bnp(64),
        "conv1tr": 0.1 * jax.random.normal(jax.random.fold_in(key, 21),
                                           (64 + 32, 64), jnp.bfloat16),
        "final": 0.1 * jax.random.normal(jax.random.fold_in(key, 22),
                                         (64, 32), jnp.bfloat16),
    }

    def resblock(x, occ, nbr, wa, bna, wb, bnb):
        r = x
        y = conv3(halo6(x, nbr), wa).reshape(x.shape[0], 8, -1)
        y = bn_relu(y.reshape(x.shape[:4] + (y.shape[-1],)), occ, *bna)
        y = conv3(halo6(y, nbr), wb)
        # bn (no relu before skip-add), then relu(add)
        yf = y.reshape(y.shape[0], 8, y.shape[-1])
        m = occ[..., None].astype(jnp.float32)
        cnt = jnp.sum(m) + 1e-6
        mean = jnp.sum(yf * m, (0, 1)) / cnt
        var = jnp.sum((yf - mean) ** 2 * m, (0, 1)) / cnt
        yf = (yf - mean) * jax.lax.rsqrt(var + 1e-5) * bnb[0] + bnb[1]
        out = jax.nn.relu(yf.reshape(y.shape) + r.astype(jnp.float32)) * \
            m.reshape(occ.shape[0], 2, 2, 2, 1)
        return out.astype(jnp.bfloat16)

    @jax.jit
    def forward(params, occ0, eps):
        # occupancy as conv1 input (+eps: loop data dependency, defeats LICM)
        x = occ0.astype(jnp.bfloat16).reshape(NBS[0], 2, 2, 2, 1) + eps
        h5 = halo6_w2(x, nbrs[0])
        x = conv3(h5, params["conv1"])
        x = bn_relu(x, occs[0], *params["bn1"])
        x = resblock(x, occs[0], nbrs[0], params["b1a"], params["bn1a"],
                     params["b1b"], params["bn1b"])
        s1 = x

        x = down_conv(x, nbrs[0], params["conv2"], parents[0], occs[1], NBS[1])
        x = bn_relu(x, occs[1], *params["bn2"])
        x = resblock(x, occs[1], nbrs[1], params["b2a"], params["bn2a"],
                     params["b2b"], params["bn2b"])
        s2 = x

        x = down_conv(x, nbrs[1], params["conv3"], parents[1], occs[2], NBS[2])
        x = bn_relu(x, occs[2], *params["bn3"])
        x = resblock(x, occs[2], nbrs[2], params["b3a"], params["bn3a"],
                     params["b3b"], params["bn3b"])
        s3 = x

        x = down_conv(x, nbrs[2], params["conv4"], parents[2], occs[3], NBS[3])
        x = bn_relu(x, occs[3], *params["bn4"])
        x = resblock(x, occs[3], nbrs[3], params["b4a"], params["bn4a"],
                     params["b4b"], params["bn4b"])

        x = up_conv(x, nbrs[3], params["conv4tr"], parents[2], octants[2])
        x = bn_relu(x, occs[2], *params["bn4t"])
        x = resblock(x, occs[2], nbrs[2], params["b3ta"], params["bn3ta"],
                     params["b3tb"], params["bn3tb"])
        x = jnp.concatenate([x, s3], -1)

        x = up_conv(x, nbrs[2], params["conv3tr"], parents[1], octants[1])
        x = bn_relu(x, occs[1], *params["bn3t"])
        x = resblock(x, occs[1], nbrs[1], params["b2ta"], params["bn2ta"],
                     params["b2tb"], params["bn2tb"])
        x = jnp.concatenate([x, s2], -1)

        x = up_conv(x, nbrs[1], params["conv2tr"], parents[0], octants[0])
        x = bn_relu(x, occs[0], *params["bn2t"])
        x = resblock(x, occs[0], nbrs[0], params["b1ta"], params["bn1ta"],
                     params["b1tb"], params["bn1tb"])
        x = jnp.concatenate([x, s1], -1)

        x = jnp.einsum("bxyzc,cd->bxyzd", x, params["conv1tr"],
                       preferred_element_type=jnp.float32)
        x = jax.nn.relu(x).astype(jnp.bfloat16)
        x = jnp.einsum("bxyzc,cd->bxyzd", x, params["final"],
                       preferred_element_type=jnp.float32)
        n = jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12
        return (x / n).astype(jnp.bfloat16)

    occ0 = occs[0]
    K = 16

    @jax.jit
    def loop(p, occ0):
        def body(i, acc):
            eps = (acc[0, 0] * 1e-30).astype(jnp.bfloat16)
            f = forward(p, occ0, eps)
            return acc + f.reshape(-1, 32)[:1].astype(jnp.float32)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((1, 32)))

    _force(loop(params, occ0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _force(loop(params, occ0))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"brick ResUNetBN2C forward (1 cloud, 32k vox): {best*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
