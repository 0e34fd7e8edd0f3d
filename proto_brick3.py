"""Prototype v3: brick conv as structured-dense matmul [NB,64C]@[64C,8Co].

W_big embedding: out cell u (of 8), in halo cell h (of 64): tap iff
h - (u+1) in [-1,1]^3 (halo coord = cell coord + 1). FLOPs 2.37x exact but
one perfectly-shaped MXU matmul. Measures the whole ResUNetBN2C forward.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from proto_brick import halo6, halo6_w2, NBS, CH


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.float32))


def embed_w(W):
    """W [3,3,3,Ci,Co] -> W_big [64*Ci, 8*Co] (f32/bf16 passthrough)."""
    Ci, Co = W.shape[3], W.shape[4]
    Wb = np.zeros((4, 4, 4, Ci, 2, 2, 2, Co), np.float32)
    W = np.asarray(W, np.float32)
    for ux in range(2):
        for uy in range(2):
            for uz in range(2):
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        for dz in (-1, 0, 1):
                            Wb[ux+1+dx, uy+1+dy, uz+1+dz, :, ux, uy, uz, :] = \
                                W[dx+1, dy+1, dz+1]
    return jnp.asarray(Wb.reshape(64 * Ci, 8 * Co), jnp.bfloat16)


def embed_w_down(W):
    """Stride-2: one output cell at halo position (1,1,1)+d."""
    Ci, Co = W.shape[3], W.shape[4]
    Wb = np.zeros((4, 4, 4, Ci, Co), np.float32)
    W = np.asarray(W, np.float32)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                Wb[1+dx, 1+dy, 1+dz] = W[dx+1, dy+1, dz+1]
    return jnp.asarray(Wb.reshape(64 * Ci, Co), jnp.bfloat16)


def embed_w_up(W):
    """Up (transposed s2): fine brick from 2^3 coarse window.
    out fine cell u in {0,1}^3, window cell c in {0,1}^3:
    tap d = 2c - u must be in [-1,1]^3; weight W[d+1]."""
    Ci, Co = W.shape[3], W.shape[4]
    Wb = np.zeros((2, 2, 2, Ci, 2, 2, 2, Co), np.float32)
    W = np.asarray(W, np.float32)
    for ux in range(2):
        for uy in range(2):
            for uz in range(2):
                for cx in range(2):
                    for cy in range(2):
                        for cz in range(2):
                            d = (2*cx-ux, 2*cy-uy, 2*cz-uz)
                            if all(-1 <= v <= 1 for v in d):
                                Wb[cx, cy, cz, :, ux, uy, uz, :] = \
                                    W[d[0]+1, d[1]+1, d[2]+1]
    return jnp.asarray(Wb.reshape(8 * Ci, 8 * Co), jnp.bfloat16)


def conv_mm(fb, nbr, Wb):
    """fb [NB,2,2,2,C] bf16 -> [NB,8,Co] f32."""
    NB, C = fb.shape[0], fb.shape[-1]
    H = halo6(fb, nbr).reshape(NB, 64 * C)
    return jax.lax.dot(H, Wb, preferred_element_type=jnp.float32).reshape(NB, 8, -1)


def bn_relu(y, occ, scale, bias, relu=True):
    """y [NB,8,C] f32 -> bf16."""
    m = occ[..., None].astype(jnp.float32)
    cnt = jnp.sum(m) + 1e-6
    mean = jnp.sum(y * m, (0, 1)) / cnt
    var = jnp.sum(y * y * m, (0, 1)) / cnt - mean * mean
    y = (y - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    if relu:
        y = jax.nn.relu(y)
    return (y * m).astype(jnp.bfloat16)


def main():
    key = jax.random.PRNGKey(0)
    L = 4
    nbrs, occs, parents, octs = [], [], [], []
    for l in range(L):
        k = jax.random.fold_in(key, l)
        nbrs.append(jax.random.randint(k, (NBS[l], 6), 0, NBS[l]))
        occs.append(jax.random.uniform(k, (NBS[l], 8)) < 0.25)
        if l + 1 < L:
            parents.append(jax.random.randint(k, (NBS[l],), 0, NBS[l + 1] * 8))
            # fine brick -> (parent coarse brick, octant) flat halo-slot
            octs.append(jax.random.randint(k, (NBS[l],), 0, 8))

    def W3(k, ci, co):
        return 0.1 * np.random.default_rng(k).standard_normal((3, 3, 3, ci, co)).astype(np.float32)

    def bnp(c):
        return jnp.ones((c,)), jnp.zeros((c,))

    P = {
        "conv1": jnp.asarray(0.1*np.random.default_rng(0).standard_normal((5,5,5,1,32)), jnp.bfloat16),
        "bn1": bnp(32),
        "b1a": embed_w(W3(1, 32, 32)), "bn1a": bnp(32),
        "b1b": embed_w(W3(2, 32, 32)), "bn1b": bnp(32),
        "conv2": embed_w_down(W3(3, 32, 64)), "bn2": bnp(64),
        "b2a": embed_w(W3(4, 64, 64)), "bn2a": bnp(64),
        "b2b": embed_w(W3(5, 64, 64)), "bn2b": bnp(64),
        "conv3": embed_w_down(W3(6, 64, 128)), "bn3": bnp(128),
        "b3a": embed_w(W3(7, 128, 128)), "bn3a": bnp(128),
        "b3b": embed_w(W3(8, 128, 128)), "bn3b": bnp(128),
        "conv4": embed_w_down(W3(9, 128, 256)), "bn4": bnp(256),
        "b4a": embed_w(W3(10, 256, 256)), "bn4a": bnp(256),
        "b4b": embed_w(W3(11, 256, 256)), "bn4b": bnp(256),
        "conv4tr": embed_w_up(W3(12, 256, 64)), "bn4t": bnp(64),
        "b3ta": embed_w(W3(13, 64, 64)), "bn3ta": bnp(64),
        "b3tb": embed_w(W3(14, 64, 64)), "bn3tb": bnp(64),
        "conv3tr": embed_w_up(W3(15, 192, 64)), "bn3t": bnp(64),
        "b2ta": embed_w(W3(16, 64, 64)), "bn2ta": bnp(64),
        "b2tb": embed_w(W3(17, 64, 64)), "bn2tb": bnp(64),
        "conv2tr": embed_w_up(W3(18, 128, 64)), "bn2t": bnp(64),
        "b1ta": embed_w(W3(19, 64, 64)), "bn1ta": bnp(64),
        "b1tb": embed_w(W3(20, 64, 64)), "bn1tb": bnp(64),
        "conv1tr": jnp.asarray(0.1*np.random.default_rng(21).standard_normal((96, 64)), jnp.bfloat16),
        "final": jnp.asarray(0.1*np.random.default_rng(22).standard_normal((64, 32)), jnp.bfloat16),
    }

    def shp(x):  # [NB,8,C] -> [NB,2,2,2,C]
        return x.reshape(x.shape[0], 2, 2, 2, x.shape[-1])

    def resblock(x, occ, nbr, wa, bna, wb, bnb):
        r = x                                          # bf16 [NB,8,C]
        y = conv_mm(shp(x), nbr, wa)
        y = bn_relu(y, occ, *bna)
        y = conv_mm(shp(y), nbr, wb)
        m = occ[..., None].astype(jnp.float32)
        cnt = jnp.sum(m) + 1e-6
        mean = jnp.sum(y * m, (0, 1)) / cnt
        var = jnp.sum(y * y * m, (0, 1)) / cnt - mean * mean
        y = (y - mean) * jax.lax.rsqrt(var + 1e-5) * bnb[0] + bnb[1]
        out = jax.nn.relu(y + r.astype(jnp.float32)) * m
        return out.astype(jnp.bfloat16)

    def down(x, nbr, Wb, parent, nbc):
        NB, C = x.shape[0], x.shape[-1]
        H = halo6(shp(x), nbr).reshape(NB, 64 * C)
        o = jax.lax.dot(H, Wb, preferred_element_type=jnp.float32)
        cells = jnp.zeros((nbc * 8, o.shape[-1]), jnp.float32)
        return cells.at[parent].add(o, mode="drop").reshape(nbc, 8, -1)

    def up(xc, nbr_c, Wb, parent_f, oct_f, nbf):
        NBc, C = xc.shape[0], xc.shape[-1]
        Hc = halo6(shp(xc), nbr_c)                      # [NBc,4,4,4,C]
        # 8 octant windows, each [NBc, 2,2,2, C]
        wins = jnp.stack([
            Hc[:, ox:ox+2+1:1][:, 0:2][:, :, oy:oy+2, oz:oz+2]
            if False else
            Hc[:, 1+ox-1:1+ox+1, 1+oy-1:1+oy+1, 1+oz-1:1+oz+1]
            for ox in range(2) for oy in range(2) for oz in range(2)
        ], 1)                                           # [NBc, 8, 2,2,2, C]
        wins = wins.reshape(NBc * 8, 8 * C)
        g = jnp.take(wins, parent_f * 8 + oct_f, axis=0)  # [NBf, 8C]
        return jax.lax.dot(g, Wb, preferred_element_type=jnp.float32).reshape(nbf, 8, -1)

    @jax.jit
    def forward(P, eps):
        x0 = occs[0].astype(jnp.bfloat16).reshape(NBS[0], 2, 2, 2, 1) + eps
        h5 = halo6_w2(x0, nbrs[0])
        x = jax.lax.conv_general_dilated(
            h5, P["conv1"], (1, 1, 1), "VALID",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
            preferred_element_type=jnp.float32).reshape(NBS[0], 8, 32)
        x = bn_relu(x, occs[0], *P["bn1"])
        x = resblock(x, occs[0], nbrs[0], P["b1a"], P["bn1a"], P["b1b"], P["bn1b"])
        s1 = x
        x = down(x, nbrs[0], P["conv2"], parents[0], NBS[1])
        x = bn_relu(x, occs[1], *P["bn2"])
        x = resblock(x, occs[1], nbrs[1], P["b2a"], P["bn2a"], P["b2b"], P["bn2b"])
        s2 = x
        x = down(x, nbrs[1], P["conv3"], parents[1], NBS[2])
        x = bn_relu(x, occs[2], *P["bn3"])
        x = resblock(x, occs[2], nbrs[2], P["b3a"], P["bn3a"], P["b3b"], P["bn3b"])
        s3 = x
        x = down(x, nbrs[2], P["conv4"], parents[2], NBS[3])
        x = bn_relu(x, occs[3], *P["bn4"])
        x = resblock(x, occs[3], nbrs[3], P["b4a"], P["bn4a"], P["b4b"], P["bn4b"])

        x = up(x, nbrs[3], P["conv4tr"], parents[2] // 8, octs[2], NBS[2])
        x = bn_relu(x, occs[2], *P["bn4t"])
        x = resblock(x, occs[2], nbrs[2], P["b3ta"], P["bn3ta"], P["b3tb"], P["bn3tb"])
        x = jnp.concatenate([x, s3], -1)
        x = up(x, nbrs[2], P["conv3tr"], parents[1] // 8, octs[1], NBS[1])
        x = bn_relu(x, occs[1], *P["bn3t"])
        x = resblock(x, occs[1], nbrs[1], P["b2ta"], P["bn2ta"], P["b2tb"], P["bn2tb"])
        x = jnp.concatenate([x, s2], -1)
        x = up(x, nbrs[1], P["conv2tr"], parents[0] // 8, octs[0], NBS[0])
        x = bn_relu(x, occs[0], *P["bn2t"])
        x = resblock(x, occs[0], nbrs[0], P["b1ta"], P["bn1ta"], P["b1tb"], P["bn1tb"])
        x = jnp.concatenate([x, s1], -1)

        x = jax.nn.relu(jnp.einsum("nkc,cd->nkd", x, P["conv1tr"],
                                   preferred_element_type=jnp.float32))
        x = jnp.einsum("nkc,cd->nkd", x.astype(jnp.bfloat16), P["final"],
                       preferred_element_type=jnp.float32)
        n = jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12
        return (x / n).astype(jnp.bfloat16)

    K = 16

    @jax.jit
    def loop(P):
        def body(i, acc):
            eps = (acc[0, 0] * 1e-30).astype(jnp.bfloat16)
            f = forward(P, eps)
            return acc + f.reshape(-1, 32)[:1].astype(jnp.float32)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((1, 32)))

    _force(loop(P))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _force(loop(P))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"brick-mm ResUNetBN2C forward (1 cloud, 32k vox): {best*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
