"""Subprocess body of test_overfit_bf16_mixed_precision.

Runs in its own process WITHOUT the conftest's 8-virtual-device XLA flag:
bf16 emulation on the CPU backend costs ~10 s/step even at 32 px, and
multiplies further under the 8-virtual-device flag. Prints
BF16_OK on success."""
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from danet_densepose2smpl_tpu.core.config import Config, DaNetConfig, SolverConfig
from danet_densepose2smpl_tpu.data import synthetic_batch
from danet_densepose2smpl_tpu.models.danet import DaNet
from danet_densepose2smpl_tpu.smpl import synthetic_smpl_model
from danet_densepose2smpl_tpu.train import create_train_state, make_train_step


def main():
    cfg = Config(
        danet=DaNetConfig(
            iuv_regressor="resnet", msres_num_layers=18, img_size=32, heatmap_size=8,
            stn_center_jitter=0.0, stn_scale_jitter=0.0, partdrop_rate=0.0,
            compute_dtype="bfloat16",
        ),
        solver=SolverConfig(base_lr=3e-4),
    )
    smpl = synthetic_smpl_model(num_verts=200, seed=0)
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 4, num_verts=200, img_size=32, num_dp_points=32))
    model = DaNet(cfg.danet, train=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    step = make_train_step(model, smpl, cfg, donate=False)

    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss_total"]))
    losses = np.array(losses)
    assert np.isfinite(losses).all(), losses
    first, last = losses[:3].mean(), losses[-3:].mean()
    assert last < first / 1.15, f"bf16 loss did not drop: {first:.3f} -> {last:.3f}"
    print(f"BF16_OK {first:.2f}->{last:.2f}")


if __name__ == "__main__":
    main()
