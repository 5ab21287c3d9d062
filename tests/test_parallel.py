"""Sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_spectra_tpu.config import OptimizerConfig
from vision_spectra_tpu.losses import make_cross_entropy
from vision_spectra_tpu.models import build_vit
from vision_spectra_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    param_shardings,
)
from vision_spectra_tpu.training.state import TrainState, make_optimizer


@pytest.fixture()
def model_and_state():
    # Function-scoped: the sharded train step donates (and thus deletes) the
    # state buffers, so each test needs a fresh state.
    model, _ = build_vit(
        "vit_tiny_patch4_28", num_classes=3, image_size=28,
        embed_dim=64, depth=2, num_heads=2, drop_path_rate=0.0,
    )
    x = jnp.zeros((1, 28, 28, 3))
    params = model.init(jax.random.key(0), x)["params"]
    tx = make_optimizer(OptimizerConfig(), gradient_clip=1.0)
    return model, TrainState.create(params, tx), tx


def test_eight_devices_available(cpu_devices):
    assert len(cpu_devices) == 8


def test_mesh_shapes():
    mesh = make_mesh(model_axis=2)
    assert mesh.shape["data"] == 4
    assert mesh.shape["model"] == 2
    mesh_dp = make_mesh()
    assert mesh_dp.shape["data"] == 8

    with pytest.raises(ValueError):
        make_mesh(model_axis=3)


def test_tp_param_specs(model_and_state):
    _, state, _ = model_and_state
    mesh = make_mesh(model_axis=2)
    shardings = param_shardings(mesh, state.params)
    qkv = shardings["blocks_0"]["attn"]["qkv"]["kernel"].spec
    assert qkv == jax.sharding.PartitionSpec(None, "model")
    proj = shardings["blocks_0"]["attn"]["proj"]["kernel"].spec
    assert proj == jax.sharding.PartitionSpec("model", None)
    fc1 = shardings["blocks_0"]["mlp"]["fc1"]["kernel"].spec
    assert fc1 == jax.sharding.PartitionSpec(None, "model")
    head = shardings["head"]["kernel"].spec
    assert head == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("model_axis", [1, 2])
def test_sharded_train_step_runs(model_and_state, model_axis):
    model, state, tx = model_and_state
    mesh = make_mesh(model_axis=model_axis)
    step, sharded = make_sharded_train_step(
        mesh, model, make_cross_entropy(), tx, state
    )
    step_before = int(state.step)
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, size=(16, 28, 28, 3), dtype=np.uint8)
    labels = rng.randint(0, 3, size=16).astype(np.int32)
    new_state, metrics = step(
        sharded, images, labels, jax.random.key(1), jnp.float32(1e-3)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == step_before + 1


def test_dp_matches_single_device(model_and_state):
    """Data-parallel step computes the same update as single-device jit."""
    model, state, tx = model_and_state
    loss_fn = make_cross_entropy()
    rng = np.random.RandomState(1)
    images = rng.randint(0, 256, size=(8, 28, 28, 3), dtype=np.uint8)
    labels = rng.randint(0, 3, size=8).astype(np.int32)
    key = jax.random.key(5)
    lr = jnp.float32(1e-3)

    from vision_spectra_tpu.data.transforms import train_augment
    from vision_spectra_tpu.training.state import apply_updates

    @jax.jit
    def step_single(state, images_u8, labels, key, lr):
        k_aug, k_drop, k_mask = jax.random.split(key, 3)
        images = train_augment(images_u8, k_aug, num_channels=3)

        def compute_loss(params):
            logits = model.apply(
                {"params": params}, images, deterministic=False,
                rngs={"dropout": k_drop, "mask": k_mask},
            )
            return loss_fn(logits, labels), logits

        (loss, logits), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        return apply_updates(state, grads, tx, lr, None), loss

    single_state, single_loss = step_single(state, images, labels, key, lr)
    single_loss = float(single_loss)

    mesh = make_mesh()  # 8-way dp
    model2, state2, tx2 = (model, None, tx)
    x = jnp.zeros((1, 28, 28, 3))
    params2 = model.init(jax.random.key(0), x)["params"]
    state2 = TrainState.create(params2, tx)
    step_dp, sharded = make_sharded_train_step(mesh, model, loss_fn, tx, state2)
    dp_state, dp_metrics = step_dp(sharded, images, labels, key, lr)

    assert float(dp_metrics["loss"]) == pytest.approx(single_loss, rel=1e-4)
    # float32 reduction order differs across the 8-way split; allow small
    # absolute noise relative to the ~1e-3 Adam update magnitude.
    for a, b in zip(
        jax.tree.leaves(dp_state.params), jax.tree.leaves(single_state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)
