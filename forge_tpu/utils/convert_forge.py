"""Full FORGE torch-checkpoint -> forge_tpu variables conversion.

Maps the reference model's state-dict names (models/model.py:18-39 composition:
encoder_3d / render / rotate / encoder_traj / encoder_traj_2d / pose_head,
with torch Sequential numeric indices) onto the forge_tpu parameter tree, so
released `.pth.tar` weights load directly (the reference's module-prefix
normalization lives at utils/exp_utils.py:140-147; strip 'module.' before
calling this).

The map is DECLARATIVE: (torch_prefix, kind, forge_path) rows. `kind` decides
the tensor transforms:
  conv    Conv1d/2d/3d      (out,in,*k)->(*k,in,out); Conv1d k=1 -> Dense
  deconv  ConvTransposeNd   (in,out,*k)->(*k,out,in)
  bn      BatchNormNd       weight/bias -> scale/bias; running stats -> batch_stats
  ln      LayerNorm         weight/bias -> scale/bias
  linear  Linear            weight.T
  param   raw Parameter     copied (shape-checked)

The reference's `rotate.conv3d_*` weights are dead code (never used in the
forward, models/rotate.py:143-154) and are intentionally dropped.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from forge_tpu.utils.convert_torch import (
    TreeBuilder, _conv, _deconv, _linear, _RESNET50_STAGES,
)

Arrays = Dict[str, np.ndarray]


def _resnet_rows(tprefix: str, fprefix: str, extra_wrap: bool = False):
    """Rows for a torchvision-style resnet trunk.

    extra_wrap: the pose-2D FPN wraps each stage in ANOTHER Sequential
    (models/pose_estimator_2d.py:101-104), giving keys like layer1.0.<block>.
    """
    rows = []
    wrap = ".0" if extra_wrap else ""
    rows.append((f"{tprefix}conv1", "conv", f"{fprefix}conv1"))
    rows.append((f"{tprefix}bn1", "bn", f"{fprefix}bn1"))
    for li, (planes, blocks) in enumerate(_RESNET50_STAGES):
        for bi in range(blocks):
            tb = f"{tprefix}layer{li + 1}{wrap}.{bi}"
            fb = f"{fprefix}layer{li + 1}_{bi}"
            for ci in (1, 2, 3):
                rows.append((f"{tb}.conv{ci}", "conv", f"{fb}/conv{ci}"))
                rows.append((f"{tb}.bn{ci}", "bn", f"{fb}/bn{ci}"))
            if bi == 0:
                rows.append((f"{tb}.downsample.0", "conv", f"{fb}/downsample_conv"))
                rows.append((f"{tb}.downsample.1", "bn", f"{fb}/downsample_bn"))
    return rows


def _seq_resnet_rows(tprefix: str, fprefix: str):
    """Encoder backbone: nn.Sequential(children[:-2]) — numeric indices
    (models/encoder.py:71-78): 0=conv1 1=bn1 4..7=layer1..4."""
    rows = [(f"{tprefix}0", "conv", f"{fprefix}conv1"),
            (f"{tprefix}1", "bn", f"{fprefix}bn1")]
    for li, (planes, blocks) in enumerate(_RESNET50_STAGES):
        for bi in range(blocks):
            tb = f"{tprefix}{li + 4}.{bi}"
            fb = f"{fprefix}layer{li + 1}_{bi}"
            for ci in (1, 2, 3):
                rows.append((f"{tb}.conv{ci}", "conv", f"{fb}/conv{ci}"))
                rows.append((f"{tb}.bn{ci}", "bn", f"{fb}/bn{ci}"))
            if bi == 0:
                rows.append((f"{tb}.downsample.0", "conv", f"{fb}/downsample_conv"))
                rows.append((f"{tb}.downsample.1", "bn", f"{fb}/downsample_bn"))
    return rows


def _block_rows(tprefix: str, fprefix: str):
    """PoseTransformer Block (models/model_utils.py:144-229): Conv1d k=1
    projections -> Dense; norms; Mlp."""
    return [
        (f"{tprefix}.norm", "ln", f"{fprefix}/norm"),
        (f"{tprefix}.norm2", "ln", f"{fprefix}/norm2"),
        (f"{tprefix}.encode_query", "conv1d_dense", f"{fprefix}/encode_query"),
        (f"{tprefix}.encode_key", "conv1d_dense", f"{fprefix}/encode_key"),
        (f"{tprefix}.encode_value", "conv1d_dense", f"{fprefix}/encode_value"),
        (f"{tprefix}.mlp.fc1", "linear", f"{fprefix}/mlp/fc1"),
        (f"{tprefix}.mlp.fc2", "linear", f"{fprefix}/mlp/fc2"),
    ]


def _perceiver_rows(tprefix: str, fprefix: str, cross: bool):
    """CrossAttention/SelfAttention (models/model_utils.py:359-428)."""
    rows = []
    if cross:
        rows += [(f"{tprefix}.q_norm", "ln", f"{fprefix}/q_norm"),
                 (f"{tprefix}.k_norm", "ln", f"{fprefix}/k_norm"),
                 (f"{tprefix}.v_norm", "ln", f"{fprefix}/v_norm")]
    else:
        rows += [(f"{tprefix}.norm", "ln", f"{fprefix}/norm")]
    for p in ("q_proj", "k_proj", "v_proj", "o_proj"):
        rows.append((f"{tprefix}.attention.{p}", "linear",
                     f"{fprefix}/attention/{p}"))
    rows += [(f"{tprefix}.mlp.mlp.0", "ln", f"{fprefix}/mlp/LayerNorm_0"),
             (f"{tprefix}.mlp.mlp.1", "linear", f"{fprefix}/mlp/Dense_0"),
             (f"{tprefix}.mlp.mlp.3", "linear", f"{fprefix}/mlp/Dense_1")]
    return rows


def forge_key_map() -> List[Tuple[str, str, str]]:
    rows: List[Tuple[str, str, str]] = []

    # ---- encoder_3d (models/encoder.py)
    rows += _seq_resnet_rows("encoder_3d.feature_extraction.",
                             "encoder_3d/feature_extraction/")
    rows += [
        ("encoder_3d.conv1.0", "conv", "encoder_3d/conv1_conv"),
        ("encoder_3d.conv1.1", "bn", "encoder_3d/conv1_bn"),
        ("encoder_3d.features_head.0", "deconv", "encoder_3d/fh_deconv"),
        ("encoder_3d.features_head.1", "bn", "encoder_3d/fh_bn1"),
        ("encoder_3d.features_head.3", "conv", "encoder_3d/fh_conv"),
        ("encoder_3d.features_head.4", "bn", "encoder_3d/fh_bn2"),
        ("encoder_3d.density_head.0", "deconv", "encoder_3d/dh_deconv"),
        ("encoder_3d.density_head.1", "bn", "encoder_3d/dh_bn1"),
        ("encoder_3d.density_head.3", "conv", "encoder_3d/dh_conv1"),
        ("encoder_3d.density_head.4", "bn", "encoder_3d/dh_bn2"),
        ("encoder_3d.density_head.6", "conv", "encoder_3d/dh_conv2"),
        # ConvGRU (models/fusion.py:39-68)
        ("encoder_3d.fusion_feature.cells.0.conv_gate", "conv",
         "encoder_3d/fusion_feature/cell_0/conv_gate"),
        ("encoder_3d.fusion_feature.cells.0.out_gate", "conv",
         "encoder_3d/fusion_feature/cell_0/out_gate"),
        ("encoder_3d.fusion_feature.fusion_norm", "bn",
         "encoder_3d/fusion_feature/fusion_norm"),
        ("encoder_3d.fusion_feature.fusion_conv.0", "conv",
         "encoder_3d/fusion_feature/fusion_conv1"),
        ("encoder_3d.fusion_feature.fusion_conv.1", "bn",
         "encoder_3d/fusion_feature/fusion_bn1"),
        ("encoder_3d.fusion_feature.fusion_conv.3", "conv",
         "encoder_3d/fusion_feature/fusion_conv2"),
        ("encoder_3d.fusion_feature.fusion_conv.4", "bn",
         "encoder_3d/fusion_feature/fusion_bn2"),
    ]

    # ---- render (models/volume_render.py:29-37)
    rows += [
        ("render.conv_rgb.0", "deconv", "render/conv_rgb_deconv"),
        ("render.conv_rgb.1", "bn", "render/conv_rgb_bn1"),
        ("render.conv_rgb.3", "conv", "render/conv_rgb_conv1"),
        ("render.conv_rgb.4", "bn", "render/conv_rgb_bn2"),
        ("render.conv_rgb.6", "conv", "render/conv_rgb_conv2"),
    ]

    # ---- encoder_traj / PoseEstimator3D (models/pose_estimator_3d.py)
    rows += [
        ("encoder_traj.conv3d_1.0", "conv", "encoder_traj/conv3d_1a"),
        ("encoder_traj.conv3d_1.1", "bn", "encoder_traj/conv3d_1bn"),
        ("encoder_traj.conv3d_1.3", "conv", "encoder_traj/conv3d_1b"),
        ("encoder_traj.conv3d_2.0", "conv", "encoder_traj/conv3d_2a"),
        ("encoder_traj.conv3d_2.1", "bn", "encoder_traj/conv3d_2abn"),
        ("encoder_traj.conv3d_2.3", "conv", "encoder_traj/conv3d_2b"),
        ("encoder_traj.conv3d_2.4", "bn", "encoder_traj/conv3d_2bbn"),
        ("encoder_traj.conv3d_3.0", "conv", "encoder_traj/conv3d_3a"),
        ("encoder_traj.conv3d_3.1", "bn", "encoder_traj/conv3d_3abn"),
        ("encoder_traj.conv3d_3.3", "conv", "encoder_traj/conv3d_3b"),
        ("encoder_traj.conv3d_3.4", "bn", "encoder_traj/conv3d_3bbn"),
        ("encoder_traj.pose_head_1.0", "conv", "encoder_traj/pose_head_1a"),
        ("encoder_traj.pose_head_1.1", "bn", "encoder_traj/pose_head_1bn"),
        ("encoder_traj.pose_head_1.3", "conv", "encoder_traj/pose_head_1b"),
        ("encoder_traj.pose_head_2.0", "ln", "encoder_traj/pose_head_2_norm"),
        ("encoder_traj.out.0", "linear", "encoder_traj/out_fc1"),
        ("encoder_traj.out.1", "bn", "encoder_traj/out_bn"),
        ("encoder_traj.out.3", "linear", "encoder_traj/out_fc2"),
    ]
    rows += _block_rows("encoder_traj.pose_transformer.cross_transformer",
                        "encoder_traj/pose_transformer/cross")
    rows += _block_rows("encoder_traj.pose_transformer.self_transformer",
                        "encoder_traj/pose_transformer/self")

    # ---- encoder_traj_2d / PoseEstimator2D (models/pose_estimator_2d.py)
    # FPN backbone: layer0 = Sequential(conv1, bn1, leakyrelu, maxpool)
    rows += [
        ("encoder_traj_2d.backbone.layer0.0", "conv",
         "encoder_traj_2d/backbone/resnet/conv1"),
        ("encoder_traj_2d.backbone.layer0.1", "bn",
         "encoder_traj_2d/backbone/resnet/bn1"),
        ("encoder_traj_2d.backbone.toplayer", "conv",
         "encoder_traj_2d/backbone/toplayer"),
        ("encoder_traj_2d.backbone.latlayer1", "conv",
         "encoder_traj_2d/backbone/latlayer1"),
        ("encoder_traj_2d.backbone.smooth1", "conv",
         "encoder_traj_2d/backbone/smooth1"),
    ]
    # stages wrapped in an extra Sequential (keys layerN.0.<block>)
    for li, (planes, blocks) in enumerate(_RESNET50_STAGES):
        for bi in range(blocks):
            tb = f"encoder_traj_2d.backbone.layer{li + 1}.0.{bi}"
            fb = f"encoder_traj_2d/backbone/resnet/layer{li + 1}_{bi}"
            for ci in (1, 2, 3):
                rows.append((f"{tb}.conv{ci}", "conv", f"{fb}/conv{ci}"))
                rows.append((f"{tb}.bn{ci}", "bn", f"{fb}/bn{ci}"))
            if bi == 0:
                rows.append((f"{tb}.downsample.0", "conv", f"{fb}/downsample_conv"))
                rows.append((f"{tb}.downsample.1", "bn", f"{fb}/downsample_bn"))
    for i in range(3):
        rows += _perceiver_rows(f"encoder_traj_2d.cross_attn_blks.{i}",
                                f"encoder_traj_2d/cross_{i}", cross=True)
        rows += _perceiver_rows(f"encoder_traj_2d.self_attn_blks.{i}",
                                f"encoder_traj_2d/self_{i}", cross=False)
    rows += [
        ("encoder_traj_2d.conv.0", "conv", "encoder_traj_2d/pyr_conv1"),
        ("encoder_traj_2d.conv.1", "bn", "encoder_traj_2d/pyr_bn1"),
        ("encoder_traj_2d.conv.3", "conv", "encoder_traj_2d/pyr_conv2"),
        ("encoder_traj_2d.conv.4", "bn", "encoder_traj_2d/pyr_bn2"),
        ("encoder_traj_2d.conv.6", "conv", "encoder_traj_2d/pyr_conv3"),
        ("encoder_traj_2d.conv.7", "bn", "encoder_traj_2d/pyr_bn3"),
        ("encoder_traj_2d.conv.9", "conv", "encoder_traj_2d/pyr_conv4"),
        ("encoder_traj_2d.conv.10", "bn", "encoder_traj_2d/pyr_bn4"),
        ("encoder_traj_2d.out.0", "linear", "encoder_traj_2d/out_fc1"),
        ("encoder_traj_2d.out.1", "bn", "encoder_traj_2d/out_bn"),
        ("encoder_traj_2d.out.3", "linear", "encoder_traj_2d/out_fc2"),
        ("encoder_traj_2d.pos_emb", "param", "encoder_traj_2d/pos_emb"),
    ]

    # ---- fused pose head (models/model.py:32-39: Dropout,Linear,LN,LReLU,Linear)
    rows += [
        ("pose_head.1", "linear", "pose_head_fc1"),
        ("pose_head.2", "ln", "pose_head_norm"),
        ("pose_head.4", "linear", "pose_head_fc2"),
    ]
    return rows


def convert_forge_checkpoint(sd: Arrays, strict: bool = False) -> Dict:
    """torch state dict (numpy values, 'module.' stripped) -> {params, batch_stats}.

    strict=True raises on reference keys with no mapping (other than the known
    dead rotate convs and num_batches_tracked counters).
    """
    b = TreeBuilder()
    consumed = set()

    def take(src, suffixes):
        for suf in suffixes:
            consumed.add(f"{src}.{suf}")

    for tkey, kind, fpath in forge_key_map():
        wkey = f"{tkey}.weight" if kind != "param" else tkey
        if wkey not in sd:
            continue  # partial checkpoints are fine (curriculum stages)
        if kind == "conv":
            b._set(b.params, f"{fpath}/Conv_0/kernel", _conv(sd[wkey]))
            if f"{tkey}.bias" in sd:
                b._set(b.params, f"{fpath}/Conv_0/bias", sd[f"{tkey}.bias"])
                take(tkey, ("bias",))
            take(tkey, ("weight",))
        elif kind == "deconv":
            b._set(b.params, f"{fpath}/ConvTranspose_0/kernel", _deconv(sd[wkey]))
            if f"{tkey}.bias" in sd:
                b._set(b.params, f"{fpath}/ConvTranspose_0/bias", sd[f"{tkey}.bias"])
                take(tkey, ("bias",))
            take(tkey, ("weight",))
        elif kind == "conv1d_dense":
            w = sd[wkey]  # [out, in, 1]
            b._set(b.params, f"{fpath}/kernel", np.transpose(w[..., 0], (1, 0)))
            if f"{tkey}.bias" in sd:
                b._set(b.params, f"{fpath}/bias", sd[f"{tkey}.bias"])
                take(tkey, ("bias",))
            take(tkey, ("weight",))
        elif kind == "bn":
            b.bn(fpath, sd, tkey)
            take(tkey, ("weight", "bias", "running_mean", "running_var"))
        elif kind == "ln":
            b.layernorm(fpath, sd, tkey)
            take(tkey, ("weight", "bias"))
        elif kind == "linear":
            b.linear(fpath, sd, tkey)
            take(tkey, ("weight", "bias"))
        elif kind == "param":
            b._set(b.params, fpath, sd[tkey])
            consumed.add(tkey)

    if strict:
        leftovers = [
            k for k in sd
            if k not in consumed
            and not k.startswith("rotate.")           # dead refinement convs
            and not k.endswith("num_batches_tracked")
        ]
        if leftovers:
            raise KeyError(f"{len(leftovers)} unmapped reference keys, e.g. "
                           f"{leftovers[:8]}")
    return {"params": b.params, "batch_stats": b.stats}


def load_torch_checkpoint_file(path: str, strict: bool = False) -> Dict:
    """One-command released-checkpoint loader: .pth(.tar) file -> variables.

    Handles everything between "file on disk" and a ready {params,
    batch_stats} tree, matching the reference's loading conventions
    (utils/exp_utils.py:140-147): torch.load on CPU, an optional
    {'state_dict': ...} training-checkpoint wrapper, the DDP 'module.'
    prefix, and tensor->numpy conversion, then the declarative key map
    (convert_forge_checkpoint). Used by `run.py eval --torch-checkpoint`.
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw["state_dict"] if isinstance(raw, dict) and "state_dict" in raw else raw
    flat = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        flat[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return convert_forge_checkpoint(flat, strict=strict)
