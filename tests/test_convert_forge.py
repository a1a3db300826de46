"""Completeness of the full-FORGE checkpoint key map.

Builds the tiny model's variable tree, synthesizes a torch-style state dict
from the declarative key map (inverse tensor transforms), converts it back,
and requires the result to cover EVERY parameter and batch-stat leaf of the
real tree with exact values — so any drift between the model structure and
the converter map fails loudly.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import traverse_util

import __graft_entry__ as ge
from forge_tpu.models import FORGE
from forge_tpu.utils.convert_forge import forge_key_map, convert_forge_checkpoint
import pytest


def _synth_torch_sd(variables):
    """Invert the key map against the real tree's shapes."""
    params = traverse_util.flatten_dict(variables["params"], sep="/")
    stats = traverse_util.flatten_dict(variables["batch_stats"], sep="/")
    rng = np.random.RandomState(0)
    sd = {}
    for tkey, kind, fpath in forge_key_map():
        if kind in ("conv", "deconv"):
            sub = "Conv_0" if kind == "conv" else "ConvTranspose_0"
            kkey = f"{fpath}/{sub}/kernel"
            if kkey not in params:
                continue
            k = np.asarray(params[kkey])
            nd = k.ndim
            if kind == "conv":
                # (*k, in, out) -> (out, in, *k)
                w = np.transpose(k, (nd - 1, nd - 2) + tuple(range(nd - 2)))
            else:
                # (*k, out, in) -> (in, out, *k)
                w = np.transpose(k, (nd - 1, nd - 2) + tuple(range(nd - 2)))
            sd[f"{tkey}.weight"] = rng.randn(*w.shape).astype(np.float32)
            bkey = f"{fpath}/{sub}/bias"
            if bkey in params:
                sd[f"{tkey}.bias"] = rng.randn(*np.shape(params[bkey])).astype(np.float32)
        elif kind == "conv1d_dense":
            kkey = f"{fpath}/kernel"
            if kkey not in params:
                continue
            in_c, out_c = np.shape(params[kkey])
            sd[f"{tkey}.weight"] = rng.randn(out_c, in_c, 1).astype(np.float32)
            sd[f"{tkey}.bias"] = rng.randn(out_c).astype(np.float32)
        elif kind == "linear":
            kkey = f"{fpath}/kernel"
            if kkey not in params:
                continue
            in_c, out_c = np.shape(params[kkey])
            sd[f"{tkey}.weight"] = rng.randn(out_c, in_c).astype(np.float32)
            sd[f"{tkey}.bias"] = rng.randn(out_c).astype(np.float32)
        elif kind == "ln":
            kkey = f"{fpath}/scale"
            if kkey not in params:
                continue
            n = np.shape(params[kkey])[0]
            sd[f"{tkey}.weight"] = rng.randn(n).astype(np.float32)
            sd[f"{tkey}.bias"] = rng.randn(n).astype(np.float32)
        elif kind == "bn":
            kkey = f"{fpath}/scale"
            if kkey not in params:
                continue
            n = np.shape(params[kkey])[0]
            for suf in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{tkey}.{suf}"] = rng.randn(n).astype(np.float32)
        elif kind == "param":
            if fpath not in params:
                continue
            sd[tkey] = rng.randn(*np.shape(params[fpath])).astype(np.float32)
    return sd


@pytest.mark.slow
def test_forge_converter_covers_full_tree():
    cfg = ge.tiny_config()
    model = FORGE(cfg)
    sample = ge.synthetic_sample(cfg, b=1, t_all=10)
    variables = jax.jit(
        lambda s: model.init({"params": jax.random.PRNGKey(0)}, s,
                             method=model.init_all)
    )(sample)

    sd = _synth_torch_sd(variables)
    converted = convert_forge_checkpoint(sd, strict=True)

    for coll in ("params", "batch_stats"):
        want = traverse_util.flatten_dict(variables[coll], sep="/")
        got = traverse_util.flatten_dict(converted[coll], sep="/")
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        assert not missing, f"{coll}: {len(missing)} unmapped leaves, e.g. {missing[:8]}"
        assert not extra, f"{coll}: unexpected leaves {extra[:8]}"
        for k in want:
            assert np.shape(got[k]) == np.shape(want[k]), (
                coll, k, np.shape(got[k]), np.shape(want[k]))


def test_torch_checkpoint_file_one_command_path(tmp_path):
    """The file-on-disk glue for `run.py eval --torch-checkpoint`: torch.load,
    the {'state_dict': ...} wrapper, the DDP 'module.' prefix, and
    tensor->numpy — everything the reference does when loading a released
    .pth.tar (utils/exp_utils.py:140-147)."""
    import torch

    from forge_tpu.utils.convert_forge import load_torch_checkpoint_file

    rng = np.random.RandomState(3)
    conv_w = rng.randn(64, 3, 7, 7).astype(np.float32)
    lin_w = rng.randn(512, 2048).astype(np.float32)
    lin_b = rng.randn(512).astype(np.float32)
    bn = {s: rng.randn(64).astype(np.float32)
          for s in ("weight", "bias", "running_mean", "running_var")}
    sd = {
        "module.encoder_3d.feature_extraction.0.weight": torch.from_numpy(conv_w),
        "module.encoder_traj.out.0.weight": torch.from_numpy(lin_w),
        "module.encoder_traj.out.0.bias": torch.from_numpy(lin_b),
        **{f"module.encoder_3d.feature_extraction.1.{s}": torch.from_numpy(v)
           for s, v in bn.items()},
    }
    path = tmp_path / "cpt_best_psnr_31.8.pth.tar"
    torch.save({"state_dict": sd, "epoch": 7}, str(path))

    variables = load_torch_checkpoint_file(str(path))
    p = traverse_util.flatten_dict(variables["params"], sep="/")
    s = traverse_util.flatten_dict(variables["batch_stats"], sep="/")
    # conv OIHW -> HWIO
    np.testing.assert_array_equal(
        p["encoder_3d/feature_extraction/conv1/Conv_0/kernel"],
        np.transpose(conv_w, (2, 3, 1, 0)))
    # linear [out,in] -> [in,out]
    np.testing.assert_array_equal(
        p["encoder_traj/out_fc1/kernel"], lin_w.T)
    np.testing.assert_array_equal(p["encoder_traj/out_fc1/bias"], lin_b)
    # bn weight->scale, running stats land in batch_stats
    np.testing.assert_array_equal(
        p["encoder_3d/feature_extraction/bn1/scale"], bn["weight"])
    np.testing.assert_array_equal(
        s["encoder_3d/feature_extraction/bn1/mean"], bn["running_mean"])
