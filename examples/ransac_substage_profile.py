"""Substage micro-profile of the production scalar-form RANSAC path.

Times, at bench shapes (400 detections x 1024 points x 100 hypotheses):
  draw            — index-table build + random draw
  gather          — + the (iters, S, 3) point gathers
  fits            — + the scalar-form 10-point Umeyama fits
  residual        — + the (iters, N) residual reduction
  full            — production ransac_umeyama
Tunnel-aware pipelined timing (see examples/ransac_profile.py).
"""

import sys
import time

import numpy as np

from mot3d_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from mot3d_tpu.geometry.umeyama import (_umeyama_fit_scalars,
                                        ransac_umeyama)

B, N, ITERS, S = 400, 1024, 100, 10
REPS = 6


def main():
    data, keys = [], []
    for seed in range(REPS + 1):
        r = np.random.default_rng(seed)
        data.append((jnp.asarray(r.uniform(-0.5, 0.5, (B, N, 3)), jnp.float32),
                     jnp.asarray(r.uniform(-2, 2, (B, N, 3)), jnp.float32),
                     jnp.asarray(r.uniform(size=(B, N)) < 0.8)))
        keys.append(jax.random.split(jax.random.PRNGKey(seed), B))
    print("devices:", jax.devices(), file=sys.stderr)

    triv = jax.jit(lambda x: x.sum())
    _ = float(triv(data[0][0]))
    t0 = time.perf_counter()
    for i in range(1, REPS + 1):
        _ = float(triv(data[i][0]))
    rtt = (time.perf_counter() - t0) / REPS
    print(f"{'trivial RTT':>12}: {rtt * 1e3:7.1f} ms", file=sys.stderr)

    def timed(name, fn):
        jfn = jax.jit(fn)
        _ = float(jfn(data[0], keys[0]))
        t0 = time.perf_counter()
        out = None
        for i in range(1, REPS + 1):
            out = jfn(data[i], keys[i])
        _ = float(out)
        dt = (time.perf_counter() - t0 - rtt) / REPS
        print(f"{name:>12}: {dt * 1e3:7.1f} ms/call", file=sys.stderr,
              flush=True)

    def draw_of(v, kk):
        n = v.shape[0]
        n_valid = jnp.maximum(v.sum(), 1)
        slot = jnp.where(v, jnp.cumsum(v) - 1, n)
        tbl = jnp.zeros((n,), jnp.int32).at[slot].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        u = jax.random.randint(kk, (ITERS, S), 0, jnp.iinfo(jnp.int32).max)
        return tbl[(u % n_valid).astype(jnp.int32)]

    def stage_draw(d, k):
        _, _, val = d
        return jax.vmap(draw_of)(val, k).astype(jnp.float32).sum()
    timed("draw", stage_draw)

    def stage_gather(d, k):
        src, tgt, val = d
        def one(s, t, v, kk):
            dr = draw_of(v, kk)
            return s[dr].sum() + t[dr].sum()
        return jax.vmap(one)(src, tgt, val, k).sum()
    timed("gather", stage_gather)

    def stage_fits(d, k):
        src, tgt, val = d
        def one(s, t, v, kk):
            dr = draw_of(v, kk)
            sp, tp = s[dr], t[dr]
            sc = tuple(sp[..., j] for j in range(3))
            tc = tuple(tp[..., j] for j in range(3))
            w = jnp.ones(dr.shape, s.dtype)
            scale, rstar, trans = _umeyama_fit_scalars(sc, tc, w)
            return (scale.sum() + sum(trans[j].sum() for j in range(3))
                    + sum(rstar[i][j].sum() for i in range(3)
                          for j in range(3)))
        return jax.vmap(one)(src, tgt, val, k).sum()
    timed("fits", stage_fits)

    def stage_resid(d, k):
        src, tgt, val = d
        def one(s, t, v, kk):
            dr = draw_of(v, kk)
            sp, tp = s[dr], t[dr]
            sc = tuple(sp[..., j] for j in range(3))
            tc = tuple(tp[..., j] for j in range(3))
            w = jnp.ones(dr.shape, s.dtype)
            scale, rstar, trans = _umeyama_fit_scalars(sc, tc, w)
            px = [s[:, j] for j in range(3)]
            r = 0.0
            for j in range(3):
                tj = scale[..., None] * sum(
                    rstar[j][i][..., None] * px[i] for i in range(3)) \
                    + trans[j][..., None]
                r = r + (t[:, j] - tj) ** 2
            return jnp.sqrt(jnp.where(v, r, 0.0).sum(-1)).sum()
        return jax.vmap(one)(src, tgt, val, k).sum()
    timed("residual", stage_resid)

    def stage_full(d, k):
        src, tgt, val = d
        return jax.vmap(lambda s, t, v, kk: ransac_umeyama(s, t, v, kk)[0]
                        )(src, tgt, val, k).astype(jnp.float32).sum()
    timed("full", stage_full)


if __name__ == "__main__":
    main()
