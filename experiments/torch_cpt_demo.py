"""One-command released-weights eval, in anger (VERDICT r4 #7).

The reference's released-weights flow loads two torch `.pth.tar` training
checkpoints — the joint model for pose prediction and the GT-pose model for
rendering (kubric_eval.py:606-621, --model_gt). No released weights exist in
this zero-egress image, so this demo synthesizes a FULL-TREE torch state
dict via the converter key-map inversion (the same construction the
converter-completeness test uses, tests/test_convert_forge.py), writes two
`.pth.tar` files exactly as torch.save would produce them (module. prefixes,
{'state_dict': ...} wrapper), and then drives the real CLI:

  python -m forge_tpu.run eval --cfg configs/kubric/optimize_seen.yaml \
      --synthetic --img-size 128 \
      --torch-checkpoint <joint.pth.tar> \
      --torch-render-checkpoint <gt.pth.tar> ...

so every layer of the one-command path (torch.load, DDP-prefix strip, key
map, dual-model plumbing, eval harness, readout) runs as a user would run
it. Output tree is listed at the end for METRICS.md.

Usage: python experiments/torch_cpt_demo.py [outdir]
"""

import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import jax

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/artifacts/torch_cpt_demo"


def main():
    import torch

    from forge_tpu.config import merge_config, update_config
    from forge_tpu.models import build_model
    from test_convert_forge import _synth_torch_sd

    os.makedirs(OUT, exist_ok=True)
    cfg = update_config("configs/kubric/optimize_seen.yaml")
    cfg = merge_config(cfg, {"dataset": {"img_size": 128}})
    model = build_model(cfg)

    from forge_tpu.run import _build_dataset
    ds = _build_dataset(cfg, "test", synthetic=True, synthetic_seqs=4)
    # array leaves only, with a b=1 batch axis: dataset __getitem__ returns
    # unbatched samples with host-side strings (seq_name) that must not
    # reach the jitted init
    sample = {k: np.asarray(v)[None] for k, v in ds[0].items()
              if isinstance(v, np.ndarray) or hasattr(v, "dtype")}
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(
            lambda s: model.init({"params": jax.random.PRNGKey(0)}, s,
                                 method=model.init_all))(sample)

    paths = []
    for name, seed in (("joint", 0), ("gt_pose", 1)):
        np.random.seed(seed)
        sd = _synth_torch_sd(variables)
        # torch training checkpoints carry DDP 'module.' prefixes. BN
        # running_var must be positive (the synth tree is randn; a negative
        # variance NaNs eval-mode BN through rsqrt).
        sd_t = {f"module.{k}": torch.from_numpy(
                    np.abs(np.asarray(v)) + 0.5
                    if k.endswith("running_var")
                    else np.asarray(v) * 0.05)
                for k, v in sd.items()}
        path = os.path.join(OUT, f"cpt_{name}.pth.tar")
        torch.save({"state_dict": sd_t, "epoch": 500}, path)
        paths.append(path)
        print(f"wrote {path} ({os.path.getsize(path)/1e6:.1f} MB, "
              f"{len(sd_t)} tensors)")

    cmd = [sys.executable, "-m", "forge_tpu.run", "eval",
           "--cfg", "configs/kubric/optimize_seen.yaml",
           "--synthetic", "--synthetic-seqs", "4", "--img-size", "128",
           "--torch-checkpoint", paths[0],
           "--torch-render-checkpoint", paths[1],
           "--iter-num", "20", "--max-instances", "2", "--visualize",
           "--output-dir", OUT]
    print("\n$ " + " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd="/root/repo")
    print(f"\nCLI rc={r.returncode}; output tree:")
    for root, _dirs, files in sorted(os.walk(OUT)):
        rel = os.path.relpath(root, OUT)
        for f in sorted(files)[:6]:
            print(" ", os.path.join(rel, f))
    raise SystemExit(r.returncode)


if __name__ == "__main__":
    main()
