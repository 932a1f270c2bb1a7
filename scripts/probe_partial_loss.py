"""On-chip attribution of partial_uv_losses (losssplit found 81.9 ms at
bf16_remat_b64 — 72% of the whole loss side — for what should be a
bandwidth-bound elementwise reduction over ~100M elements, ~5 ms at HBM
speed). Times each candidate sub-cost as its own jitted graph on synthetic
tensors of the production shapes, then candidate rewrites, checking
exactness against the production implementation.

  python -m scripts.probe_partial_loss [--batch 64] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import time

import bench


def _timed(fn, iters):
    out = fn()
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(out)
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

    from danet_densepose2smpl_tpu.core.config import DaNetConfig
    from danet_densepose2smpl_tpu.models.losses import (
        cross_entropy_int,
        partial_uv_losses,
        smooth_l1,
        _safe_div,
    )

    cfg = DaNetConfig()
    B, P, S, K = args.batch, 24, 56, 7
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    part_pred = jax.random.normal(k1, (B, P, S, S, 3, K), jnp.float32)
    # GT crops look like interpolated one-hots: nonnegative, mostly sparse
    part_gt = jnp.clip(jax.random.normal(k2, (B, P, S, S, 3, K)), 0.0, 1.0)
    has_iuv = (jax.random.uniform(k3, (B,)) > 0.3).astype(jnp.float32)

    def emit(name, dt, extra=None):
        row = {"metric": f"probe_partial_{name}", "ms": round(dt * 1e3, 2)}
        if extra:
            row.update(extra)
        print(json.dumps(row), flush=True)

    # 0. production baseline
    base = jax.jit(lambda a, g, h: sum(partial_uv_losses(a, g, h, cfg)))
    dt = _timed(lambda: base(part_pred, part_gt, has_iuv), args.iters)
    emit("baseline", dt)
    ref_val = float(base(part_pred, part_gt, has_iuv))

    # 1. slicing + reshape only (materialize the 6 reshaped stacks)
    def slices_only(a, g):
        acc = 0.0
        for t in (a, g):
            for i in range(3):
                acc = acc + jnp.sum(t[..., i, :].reshape(B, P * S, S, K))
        return acc
    dt = _timed(lambda: jax.jit(slices_only)(part_pred, part_gt), args.iters)
    emit("slices_reshape", dt)

    # 2. U/V smooth-l1 terms only (fg mask from i_g)
    def uv_only(a, g, h):
        w = h[:, None, None, None, None]
        i_g = g[..., 2, :]
        fg = (i_g > 0).astype(a.dtype)[..., None, :]
        d = smooth_l1(a[..., :2, :] - g[..., :2, :])
        return jnp.sum(d * fg * w[..., None]) / B
    dt = _timed(lambda: jax.jit(uv_only)(part_pred, part_gt, has_iuv), args.iters)
    emit("uv_terms", dt)

    # 3. CE with take_along_axis (production cross_entropy_int)
    def ce_gather(a, g, h):
        i_p, i_g = a[..., 2, :], g[..., 2, :]
        lab = jnp.argmax(i_g, axis=-1)
        ce = cross_entropy_int(i_p, lab)
        w = h[:, None, None, None]
        return _safe_div(jnp.sum(ce * w), jnp.sum(w) * P * S * S / B)
    dt = _timed(lambda: jax.jit(ce_gather)(part_pred, part_gt, has_iuv), args.iters)
    emit("ce_take_along", dt)

    # 4. CE with one-hot contraction instead of gather
    def ce_onehot(a, g, h):
        i_p, i_g = a[..., 2, :], g[..., 2, :]
        lab = jnp.argmax(i_g, axis=-1)
        logp = jax.nn.log_softmax(i_p, axis=-1)
        oh = jax.nn.one_hot(lab, K, dtype=logp.dtype)
        ce = -jnp.sum(logp * oh, axis=-1)
        w = h[:, None, None, None]
        return _safe_div(jnp.sum(ce * w), jnp.sum(w) * P * S * S / B)
    dt = _timed(lambda: jax.jit(ce_onehot)(part_pred, part_gt, has_iuv), args.iters)
    emit("ce_onehot", dt)

    # 5. fully fused rewrite: no slicing/reshape, one pass over (3,7) layout
    def fused(a, g, h):
        w = h[:, None, None, None, None]
        i_g = g[..., 2, :]
        fg = (i_g > 0).astype(a.dtype)[..., None, :]
        d = smooth_l1(a[..., :2, :] - g[..., :2, :]) * fg
        uv = jnp.sum(d * w[..., None], axis=(1, 2, 3, 4, 5)) / B  # (B,)? no: sum all
        loss_uv = jnp.sum(d * w[..., None]) / B

        i_p = a[..., 2, :]
        lab = jnp.argmax(i_g, axis=-1)
        logp = jax.nn.log_softmax(i_p, axis=-1)
        oh = jax.nn.one_hot(lab, K, dtype=logp.dtype)
        ce = -jnp.sum(logp * oh, axis=-1)
        wp = h[:, None, None, None]
        loss_i = _safe_div(jnp.sum(ce * wp), jnp.sum(h) * P * S * S)
        return loss_uv + loss_i + jnp.sum(uv) * 0.0
    dt = _timed(lambda: jax.jit(fused)(part_pred, part_gt, has_iuv), args.iters)
    emit("fused_rewrite", dt)

    # 6. production partial_uv_losses but with one-hot CE (drop-in candidate):
    # exactness vs baseline checked numerically
    def candidate(a, g, h):
        w = h[:, None, None, None, None, None]
        i_g = g[..., 2:3, :]
        fg = (i_g > 0).astype(a.dtype)
        d = smooth_l1(a[..., :2, :] - g[..., :2, :]) * fg * w
        scale = cfg.point_regression_weights / (B * P)
        loss_u = jnp.sum(d[..., 0, :]) * scale
        loss_v = jnp.sum(d[..., 1, :]) * scale
        i_p = a[..., 2, :]
        lab = jnp.argmax(g[..., 2, :], axis=-1)
        logp = jax.nn.log_softmax(i_p, axis=-1)
        oh = jax.nn.one_hot(lab, K, dtype=logp.dtype)
        ce = -jnp.sum(logp * oh, axis=-1)
        loss_i = _safe_div(jnp.sum(ce * h[:, None, None, None]),
                           jnp.sum(h) * P * S * S)
        return loss_u, loss_v, loss_i
    cj = jax.jit(lambda a, g, h: sum(candidate(a, g, h)))
    dt = _timed(lambda: cj(part_pred, part_gt, has_iuv), args.iters)
    cand_val = float(cj(part_pred, part_gt, has_iuv))
    emit("candidate_full", dt,
         {"match_rel": abs(cand_val - ref_val) / max(abs(ref_val), 1e-12)})

    # 7. gradient cost of baseline vs candidate (the loss runs under grad)
    gb = jax.jit(jax.grad(lambda a: sum(partial_uv_losses(a, part_gt, has_iuv, cfg))))
    dt = _timed(lambda: jnp.sum(gb(part_pred)[0, 0, 0, 0]), args.iters)
    emit("baseline_grad", dt)
    gc = jax.jit(jax.grad(lambda a: sum(candidate(a, part_gt, has_iuv))))
    dt = _timed(lambda: jnp.sum(gc(part_pred)[0, 0, 0, 0]), args.iters)
    emit("candidate_grad", dt)


if __name__ == "__main__":
    main()
