"""On-chip probe: part_iuv_gt_crops variants (losssplit: 23.4 ms at B=64 —
now the biggest loss-side item after the CE fix).

The production path: static-index channel gather m[..., mapping] (x3),
transpose to part-major, concat bg/zero channels, stack to (B,24,S,S,3,7),
reshape, then separable crops at Precision.HIGHEST. FLOPs say ~3 ms; the
rest is gather/relayout. Variants replace the gather with a one-hot
selection MATMUL and feed the crop einsums the pixel-major layout directly.

  python -m scripts.probe_part_crops [--batch 64] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import time

import bench


def _timed(fn, fetch, iters):
    out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    bench._require_backend()
    bench._enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from danet_densepose2smpl_tpu.ops.imwarp import _axis_weights
    from danet_densepose2smpl_tpu.ops.structure import DP2SMPL_MAPPING
    from danet_densepose2smpl_tpu.train.objective import part_iuv_gt_crops

    B, P, S, C = args.batch, 24, 56, 25
    key = jax.random.PRNGKey(0)
    u_g = jnp.clip(jax.random.normal(key, (B, S, S, C)), 0, 1)
    v_g = jnp.clip(jax.random.normal(jax.random.fold_in(key, 1), (B, S, S, C)), 0, 1)
    i_g = (jax.random.uniform(jax.random.fold_in(key, 2), (B, S, S, C)) > 0.8).astype(jnp.float32)
    centers = jax.random.uniform(jax.random.fold_in(key, 3), (B, P, 2), minval=-0.5, maxval=0.5)
    scales = jax.random.uniform(jax.random.fold_in(key, 4), (B, P), minval=0.2, maxval=0.6)
    zeros23 = jnp.zeros((B, P, 3))
    theta = jnp.stack([
        jnp.concatenate([scales[..., None], jnp.zeros((B, P, 1)), centers[..., :1]], -1),
        jnp.concatenate([jnp.zeros((B, P, 1)), scales[..., None], centers[..., 1:]], -1),
    ], axis=-2) + zeros23[..., None, :] * 0  # (B, P, 2, 3)

    def emit(name, dt, extra=None):
        row = {"metric": f"probe_partcrop_{name}", "ms": round(dt * 1e3, 2), "batch": B}
        if extra:
            row.update(extra)
        print(json.dumps(row), flush=True)

    fetch = lambda o: float(jnp.sum(o))

    base = jax.jit(lambda u, v, i, t: part_iuv_gt_crops(u, v, i, t))
    dt = _timed(lambda: base(u_g, v_g, i_g, theta), fetch, args.iters)
    emit("baseline_highest", dt)
    ref = jax.block_until_ready(base(u_g, v_g, i_g, theta))

    mapping = np.asarray(DP2SMPL_MAPPING)  # (24, 6)

    # selection matrix: (3*25) -> (24 parts x 21 out-channels), one-hot for
    # the 18 mapped u/v/i channels, zero for the 2 zero-pads and the bg slot
    M = np.zeros((3 * C, P * 21), np.float32)
    # per-part layout matches stacks.reshape(..., 21): [u(7), v(7), i(7)]
    for k in range(P):
        for j in range(6):
            M[mapping[k, j], k * 21 + 1 + j] = 1.0            # u
            M[C + mapping[k, j], k * 21 + 8 + j] = 1.0        # v
            M[2 * C + mapping[k, j], k * 21 + 15 + j] = 1.0   # i
    # bg counting matrix: how many mapped i-channels fire per part
    Cnt = np.zeros((C, P), np.float32)
    for k in range(P):
        for j in range(6):
            Cnt[mapping[k, j], k] += 1.0
    Mj = jnp.asarray(M)
    Cj = jnp.asarray(Cnt)

    def matmul_variant(u, v, i, t, precision):
        uvi = jnp.concatenate([u, v, i], axis=-1)             # (B, S, S, 75)
        sel = jnp.einsum("bhwc,cd->bhwd", uvi, Mj,
                         precision=jax.lax.Precision.HIGHEST)  # one-hot: exact
        sel = sel.reshape(B, S, S, P, 21)
        # bg: 1 where NO mapped i-channel present. gi values are >= 0; the
        # production test is sum over the 6 gathered channels < 0.5 —
        # duplicates in a mapping row double-count there too (sum, not any),
        # so the counting matmul reproduces it exactly.
        gi_sum = jnp.einsum("bhwc,ck->bhwk", i, Cj,
                            precision=jax.lax.Precision.HIGHEST)
        bg = (gi_sum < 0.5).astype(u.dtype)                   # (B, S, S, P)
        sel = sel.at[..., 14].set(bg)
        tt = jax.lax.stop_gradient(t)
        wx = _axis_weights(tt[..., 0, 2], tt[..., 0, 0], S, S, u.dtype)
        wy = _axis_weights(tt[..., 1, 2], tt[..., 0, 0], S, S, u.dtype)
        tmp = jnp.einsum("bkoh,bhwkc->bkowc", wy, sel, precision=precision)
        crops = jnp.einsum("bkowc,bkpw->bkopc", tmp, wx, precision=precision)
        return crops.reshape(B, P, S, S, 3, 7)

    for prec, name in ((jax.lax.Precision.HIGHEST, "matmul_highest"),
                       (jax.lax.Precision.DEFAULT, "matmul_default")):
        f = jax.jit(lambda u, v, i, t, pr=prec: matmul_variant(u, v, i, t, pr))
        dt = _timed(lambda: f(u_g, v_g, i_g, theta), fetch, args.iters)
        got = f(u_g, v_g, i_g, theta)
        err = float(jnp.max(jnp.abs(got - ref)))
        emit(name, dt, {"max_abs_err": err})

    # production structure, HIGH precision crops (3-pass vs 6-pass)
    from danet_densepose2smpl_tpu.ops.imwarp import separable_crop_per_part

    def prod_high(u, v, i, t):
        # replicate part_iuv_gt_crops with precision=HIGH
        mappingj = jnp.asarray(DP2SMPL_MAPPING)

        def gather(m):
            g = m[..., mappingj]
            return g.transpose(0, 3, 1, 2, 4)

        gu, gv, gi = gather(u), gather(v), gather(i)
        bg_i = (jnp.sum(gi, axis=-1, keepdims=True) < 0.5).astype(gi.dtype)
        z = jnp.zeros_like(bg_i)
        pu = jnp.concatenate([z, gu], axis=-1)
        pv = jnp.concatenate([z, gv], axis=-1)
        pi = jnp.concatenate([bg_i, gi], axis=-1)
        stacks = jnp.stack([pu, pv, pi], axis=-2)
        tt = jax.lax.stop_gradient(t)
        flat = stacks.reshape(stacks.shape[:4] + (21,))
        crops = separable_crop_per_part(flat, tt[..., :, 2], tt[..., 0, 0], S,
                                        precision=jax.lax.Precision.HIGH)
        return crops.reshape(stacks.shape)

    f = jax.jit(prod_high)
    dt = _timed(lambda: f(u_g, v_g, i_g, theta), fetch, args.iters)
    got = f(u_g, v_g, i_g, theta)
    emit("prod_high", dt, {"max_abs_err": float(jnp.max(jnp.abs(got - ref)))})


if __name__ == "__main__":
    main()
