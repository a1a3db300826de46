"""Checkpoint round trips and curriculum subtree surgery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from forge_tpu.utils import checkpoint as CKPT


def _tree(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "params": {
            "encoder_3d": {
                "conv1_conv": {"Conv_0": {"kernel": rng.randn(3, 3, 4, 8).astype(np.float32)}},
                "fusion_feature": {"cell_0": {"conv_gate": {
                    "Conv_0": {"kernel": rng.randn(3, 3, 16, 8).astype(np.float32)}}}},
                "dh_conv1": {"Conv_0": {"kernel": rng.randn(3, 3, 8, 8).astype(np.float32)}},
            },
            "encoder_traj": {"out_fc1": {"kernel": rng.randn(16, 8).astype(np.float32)}},
            "encoder_traj_2d": {"out_fc1": {"kernel": rng.randn(16, 8).astype(np.float32)}},
            "pose_head_fc1": {"kernel": rng.randn(8, 4).astype(np.float32)},
            "render": {"conv_rgb_conv1": {"Conv_0": {"kernel": rng.randn(5, 5, 16, 8).astype(np.float32)}}},
        },
        "batch_stats": {
            "encoder_3d": {"conv1_bn": {"mean": rng.randn(8).astype(np.float32),
                                        "var": np.abs(rng.randn(8)).astype(np.float32)}},
        },
    }


def test_save_load_variables_roundtrip(tmp_path):
    v = _tree(0)
    path = str(tmp_path / "cpt")
    CKPT.save_variables(path, v, {"note": "test"})
    restored = CKPT.load_variables(path)
    flat_a = jax.tree_util.tree_leaves(v)
    flat_b = jax.tree_util.tree_leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_subtrees_surgery():
    dst = _tree(0)
    src = _tree(1)

    # encoder-pretrained style: encoder_3d + render only
    merged = CKPT.load_subtrees(dst, src, ("encoder_3d", "render"))
    assert np.array_equal(
        merged["params"]["encoder_3d"]["conv1_conv"]["Conv_0"]["kernel"],
        src["params"]["encoder_3d"]["conv1_conv"]["Conv_0"]["kernel"])
    assert np.array_equal(
        merged["params"]["pose_head_fc1"]["kernel"],
        dst["params"]["pose_head_fc1"]["kernel"])  # untouched
    # batch stats follow their subtree
    assert np.array_equal(
        merged["batch_stats"]["encoder_3d"]["conv1_bn"]["mean"],
        src["batch_stats"]["encoder_3d"]["conv1_bn"]["mean"])

    # without-fusion style: everything except the GRU
    merged2 = CKPT.load_subtrees(dst, src, ("*",),
                                 drop=("encoder_3d/fusion_feature",))
    assert np.array_equal(
        merged2["params"]["encoder_3d"]["fusion_feature"]["cell_0"]["conv_gate"]["Conv_0"]["kernel"],
        dst["params"]["encoder_3d"]["fusion_feature"]["cell_0"]["conv_gate"]["Conv_0"]["kernel"])
    assert np.array_equal(
        merged2["params"]["encoder_traj"]["out_fc1"]["kernel"],
        src["params"]["encoder_traj"]["out_fc1"]["kernel"])

    # 'encoder_traj' must NOT capture 'encoder_traj_2d'
    merged3 = CKPT.load_subtrees(dst, src, ("encoder_traj",))
    assert np.array_equal(
        merged3["params"]["encoder_traj_2d"]["out_fc1"]["kernel"],
        dst["params"]["encoder_traj_2d"]["out_fc1"]["kernel"])

    # underscore prefix: the pose_head_* triple
    merged4 = CKPT.load_subtrees(dst, src, ("pose_head_",))
    assert np.array_equal(
        merged4["params"]["pose_head_fc1"]["kernel"],
        src["params"]["pose_head_fc1"]["kernel"])


def test_load_subtrees_shape_mismatch_raises():
    dst = _tree(0)
    src = _tree(1)
    src["params"]["encoder_traj"]["out_fc1"]["kernel"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError):
        CKPT.load_subtrees(dst, src, ("encoder_traj",))


def test_best_tracker(tmp_path):
    tr = CKPT.BestTracker(str(tmp_path))
    state = {"x": jnp.ones(3)}
    w1 = tr.update(state, psnr=20.0, rot=10.0)
    assert "psnr" in w1 and "rot" in w1
    w2 = tr.update(state, psnr=19.0, rot=11.0)  # worse: nothing written
    assert not w2
    w3 = tr.update(state, psnr=21.0, rot=9.0)
    assert "psnr" in w3 and "rot" in w3


def test_trainstate_restore_with_template(tmp_path):
    """Resume path: orbax restore with a template must recover TrainState and
    optax node types (plain restore loses them — run.py resume regression)."""
    import optax
    from forge_tpu.train.state import TrainState

    params = {"w": jnp.ones((3, 2))}
    tx = optax.adam(1e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats={"bn": jnp.zeros(2)},
                       opt_state=tx.init(params))
    path = str(tmp_path / "cpt_last")
    # metadata carries epoch + the epoch's metric averages (run.py saves
    # {"epoch": epoch, **avg}); the narrower resume template must widen to
    # the stored keys or orbax's structure check rejects it
    CKPT.save_checkpoint(path, state, {"epoch": 3, "loss": 0.5})

    restored = CKPT.load_checkpoint(
        path, template={"state": jax.device_get(state), "metadata": {"epoch": 0}})
    rs = restored["state"]
    assert isinstance(rs, TrainState)
    assert int(restored["metadata"]["epoch"]) == 3
    assert abs(float(restored["metadata"]["loss"]) - 0.5) < 1e-9
    # restored state is usable by the optimizer
    grads = {"w": jnp.ones((3, 2))}
    updates, _ = tx.update(grads, rs.opt_state, rs.params)
    optax.apply_updates(rs.params, updates)
