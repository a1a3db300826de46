"""Activation parity against the ACTUAL reference implementation.

These tests import torch modules straight from /root/reference (pure-torch
ones only — the renderer/rotate stack needs pytorch3d, which is not in this
image), export their real state dicts, convert them with the declarative
converter, and compare forward activations. This catches converter key-name
drift that synthetic round-trip tests cannot (the synthetic dict is built
FROM the key map, so a wrong torch-side name passes there).

Skipped when /root/reference is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)


@pytest.mark.slow
def test_pose_estimator_3d_reference_parity():
    """Full PoseEstimator3D: real reference weights -> converter -> our
    module reproduces the reference forward (pose + confidence), including
    the 4096-token pose transformer, conv pyramid, LayerNorm/BatchNorm1d
    head, and the `del encoder_traj.out.*` eval surgery
    (reference: models/pose_estimator_3d.py, kubric_eval.py:619)."""
    import torch

    from models.pose_estimator_3d import PoseEstimator3D as RefPE3D
    from forge_tpu.models.pose3d import PoseEstimator3D
    from forge_tpu.utils.convert_forge import convert_forge_checkpoint

    cfg = types.SimpleNamespace(
        network=types.SimpleNamespace(rot_representation="quat"))
    torch.manual_seed(0)
    ref = RefPE3D(cfg)
    ref.eval()

    b, t, S = 1, 3, 32
    x_t = torch.randn(b, t, 128, S, S, S) * 0.5
    with torch.no_grad():
        pose_ref, conf_ref = ref(x_t)
        feat_ref = ref(x_t, return_features=True)

    sd = {f"encoder_traj.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    converted = convert_forge_checkpoint(sd, strict=False)
    variables = {
        "params": converted["params"]["encoder_traj"],
        "batch_stats": converted["batch_stats"]["encoder_traj"],
    }

    ours = PoseEstimator3D(rot_representation="quat", inp_res=16)
    x_j = jnp.asarray(np.transpose(x_t.numpy(), (0, 1, 3, 4, 5, 2)))
    pose_j, conf_j = jax.jit(
        lambda v, x: ours.apply(v, x, False))(variables, x_j)
    feat_j = jax.jit(
        lambda v, x: ours.apply(v, x, False, True))(variables, x_j)

    np.testing.assert_allclose(
        np.asarray(feat_j), feat_ref.numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(pose_j), pose_ref.numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(conf_j), conf_ref.numpy(), atol=2e-3, rtol=1e-3)

    # the eval-time weight surgery drops the fused-head-era `out` layers
    # (kubric_eval.py:619); conversion must tolerate their absence
    sd_surgery = {k: v for k, v in sd.items()
                  if not k.startswith("encoder_traj.out.")}
    conv2 = convert_forge_checkpoint(sd_surgery, strict=False)
    p2 = conv2["params"]["encoder_traj"]
    assert "out_fc1" not in p2 and "out_fc2" not in p2
    f2 = ours.apply(
        {"params": {**p2, "out_fc1": variables["params"]["out_fc1"],
                    "out_fc2": variables["params"]["out_fc2"],
                    "out_bn": variables["params"]["out_bn"]},
         "batch_stats": {**conv2["batch_stats"]["encoder_traj"],
                         "out_bn": variables["batch_stats"]["out_bn"]}},
        x_j, False, True)
    np.testing.assert_allclose(np.asarray(f2), feat_ref.numpy(),
                               atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_convgru_fusion_reference_parity():
    """ConvGRU_3D: real reference weights + forward vs ours
    (reference: models/fusion.py:21-95)."""
    import torch

    from models.fusion import ConvGRU_3D as RefGRU
    from forge_tpu.models.fusion import ConvGRU3D
    from forge_tpu.utils.convert_forge import convert_forge_checkpoint

    cfg = types.SimpleNamespace()
    torch.manual_seed(1)
    ref = RefGRU(cfg, n_layers=1, input_size=16, hidden_size=16)
    ref.eval()

    b, t, S = 2, 4, 8
    x_t = torch.randn(b, t, 16, S, S, S)
    with torch.no_grad():
        # the reference call shape (models/encoder.py:59-63)
        out_ref = ref(x_t, [ref.fusion_conv(x_t.mean(dim=1))])

    sd = {f"encoder_3d.fusion_feature.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    converted = convert_forge_checkpoint(sd, strict=False)
    sub_p = converted["params"]["encoder_3d"]["fusion_feature"]
    sub_s = converted["batch_stats"]["encoder_3d"]["fusion_feature"]

    ours = ConvGRU3D(n_layers=1, input_size=16, hidden_size=16)
    x_j = jnp.asarray(np.transpose(x_t.numpy(), (0, 1, 3, 4, 5, 2)))
    out_j = jax.jit(lambda v, x: ours.apply(v, x, False))(
        {"params": sub_p, "batch_stats": sub_s}, x_j)
    np.testing.assert_allclose(
        np.asarray(out_j),
        np.transpose(out_ref.numpy(), (0, 2, 3, 4, 1)),
        atol=1e-4, rtol=1e-4)
