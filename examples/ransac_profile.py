"""Micro-profile of the RANSAC/Umeyama solver internals at bench shapes.

400 detections x 1024-point buffers x 100 hypotheses (the pose stage's
dominant remaining cost).  Tunnel-aware timing per NOTES_ROUND2.md.
"""

import sys
import time

import numpy as np

from mot3d_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from mot3d_tpu.geometry.umeyama import (SimilarityTransform,
                                        estimate_similarity_transform,
                                        umeyama_similarity, _model_residuals)

B, N, ITERS, S = 400, 1024, 100, 10


def main():
    REPS = 6
    data = []
    for seed in range(REPS + 1):
        r = np.random.default_rng(seed)
        src = jnp.asarray(r.uniform(-0.5, 0.5, (B, N, 3)), jnp.float32)
        tgt = jnp.asarray(r.uniform(-2, 2, (B, N, 3)), jnp.float32)
        val = jnp.asarray(r.uniform(size=(B, N)) < 0.8)
        data.append((src, tgt, val))
    keys = [jax.random.split(jax.random.PRNGKey(s), B)
            for s in range(REPS + 1)]
    print("devices:", jax.devices(), file=sys.stderr)

    triv = jax.jit(lambda x: x.sum())
    _ = float(triv(data[0][0]))
    t0 = time.perf_counter()
    for i in range(1, REPS + 1):
        _ = float(triv(data[i][0]))
    rtt = (time.perf_counter() - t0) / REPS
    print(f"{'trivial RTT':>24}: {rtt * 1e3:7.1f} ms", file=sys.stderr,
          flush=True)

    def timed(name, fn):
        """Pipelined device-throughput timing: dispatch REPS distinct-input
        calls back-to-back (async), fetch only the LAST scalar (device queue
        is FIFO, so its arrival implies all finished).  One tunnel RTT
        total — the per-call figure is pure device time, immune to the
        +-20 ms per-fetch RTT variance that plagued sequential timing."""
        jfn = jax.jit(fn)
        _ = float(jfn(data[0], keys[0]))
        t0 = time.perf_counter()
        out = None
        for i in range(1, REPS + 1):
            out = jfn(data[i], keys[i])
        _ = float(out)
        dt = (time.perf_counter() - t0 - rtt) / REPS
        print(f"{name:>24}: {dt * 1e3:7.1f} ms/call", file=sys.stderr,
              flush=True)

    def scalar(tree):
        return sum(jnp.sum(jnp.nan_to_num(x.astype(jnp.float32)))
                   for x in jax.tree_util.tree_leaves(tree)
                   if jnp.issubdtype(x.dtype, jnp.floating))

    # 1. index tables (argsort over validity)
    def tables(d, k):
        _, _, val = d
        return jax.vmap(lambda v: jnp.argsort(~v))(val).astype(jnp.float32)
    timed("argsort tables", lambda d, k: scalar(tables(d, k)))

    # 2. hypothesis draws + 10-point fits (no residuals)
    def fits(d, k):
        src, tgt, val = d
        def one(s, t, v, kk):
            tbl = jnp.argsort(~v)
            nv = jnp.maximum(v.sum(), 1)
            u = jax.random.randint(kk, (ITERS, S), 0,
                                   jnp.iinfo(jnp.int32).max)
            draw = tbl[(u % nv).astype(jnp.int32)]
            w = jnp.ones((S,), s.dtype)
            return jax.vmap(lambda i: umeyama_similarity(s[i], t[i], w))(draw)
        return jax.vmap(one)(src, tgt, val, k)
    timed("draw + 100 fits", lambda d, k: scalar(fits(d, k)[:3]))

    # 3. + residual scoring over all points
    def resid(d, k):
        src, tgt, val = d
        models = fits(d, k)
        def one(s, t, v, mscale, mrot, mtrans):
            def r_of(sc, ro, tr):
                m = SimilarityTransform(sc, ro, tr, jnp.asarray(True))
                rr = _model_residuals(m, s, t)
                return jnp.sqrt((jnp.where(v, rr, 0.0) ** 2).sum())
            return jax.vmap(r_of)(mscale, mrot, mtrans)
        return jax.vmap(one)(src, tgt, val, models.scale, models.rotation,
                             models.translation)
    timed("+ residual pass", lambda d, k: scalar(resid(d, k)))

    # 3b. production ransac_umeyama alone (scalar hot path)
    from mot3d_tpu.geometry.umeyama import ransac_umeyama
    def ransac_only(d, k):
        src, tgt, val = d
        return jax.vmap(
            lambda s, t, v, kk: ransac_umeyama(s, t, v, kk)[0]
        )(src, tgt, val, k).astype(jnp.float32)
    timed("ransac_umeyama", lambda d, k: scalar(ransac_only(d, k)))

    # 3c. final umeyama fit on ~all points (the tail of the full solver)
    def final_fit(d, k):
        src, tgt, val = d
        return jax.vmap(
            lambda s, t, v: umeyama_similarity(s, t, v.astype(s.dtype))
        )(src, tgt, val)
    timed("final fit (1024pt)", lambda d, k: scalar(final_fit(d, k)[:3]))

    # 4. full solver
    def full(d, k):
        src, tgt, val = d
        return jax.vmap(
            lambda s, t, v, kk: estimate_similarity_transform(
                s, t, v, kk))(src, tgt, val, k)
    timed("full solver", lambda d, k: scalar(full(d, k)[:3]))

    # 5. full solver, nested (25, 16) vmap as the pose pipeline runs it
    def full_nested(d, k):
        src, tgt, val = d
        rs = lambda x: x.reshape((25, 16) + x.shape[1:])
        return jax.vmap(jax.vmap(
            lambda s, t, v, kk: estimate_similarity_transform(
                s, t, v, kk)))(rs(src), rs(tgt), rs(val), rs(k))
    timed("full solver (25x16)", lambda d, k: scalar(full_nested(d, k)[:3]))


if __name__ == "__main__":
    main()
