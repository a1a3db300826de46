"""Unified CLI: training curriculum, evaluation, demo, readout.

Replaces the reference's 10 entry scripts (kubric_train_pose_{2D,3D}.py,
kubric_train_joint.py, the omniobject clones, kubric_eval.py, omniobject_eval.py,
demo.py) with one command surface:

    python -m forge_tpu.run train --cfg configs/kubric/gt_pose.yaml --family single
    python -m forge_tpu.run train --cfg configs/kubric/joint_pose_2d3d.yaml --family full \
        --load 'encoder_3d,render=<cpt>' --load '*=<cpt>;drop=encoder_3d/fusion_feature'
    python -m forge_tpu.run eval  --cfg configs/kubric/optimize_seen.yaml \
        --checkpoint <cpt> --sync --split-num 8 --exp-id 0 --iter-num 1000
    python -m forge_tpu.run demo  --cfg configs/demo/demo.yaml --checkpoint <cpt> --images <dir>
    python -m forge_tpu.run readout --results <dir>/results/results.txt

Family mapping to the reference curriculum entries: 'single' =
kubric_train_pose_3D.py (steps 1.x), 'pose2d' = kubric_train_pose_2D.py
(step 2), 'full' = kubric_train_joint.py (steps 3.x). The `--load` flag is the
declarative form of the reference's 9 checkpoint-surgery loaders
(utils/exp_utils.py:185-422).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

import numpy as np


def _build_dataset(cfg, split: str, synthetic: bool, synthetic_seqs: int = 8):
    if synthetic or cfg.dataset.root == "":
        from forge_tpu.data import SyntheticVoxelDataset

        n = synthetic_seqs if split == "train" else max(2, synthetic_seqs // 4)
        return SyntheticVoxelDataset(cfg, split=split, n_seqs=n,
                                     grid=cfg.dataset.img_size // 2)
    name = cfg.dataset.name
    if name == "kubric":
        from forge_tpu.data import KubricDataset

        return KubricDataset(cfg, split=split)
    if name == "gso":
        from forge_tpu.data import GSODataset

        return GSODataset(cfg, split=split)
    if name == "omniobject3d":
        from forge_tpu.data import OmniObject3DDataset

        return OmniObject3DDataset(cfg, split=split)
    raise ValueError(f"unknown dataset {name}")


def _parse_loads(load_specs: List[str]):
    """'sub1,sub2=path[;drop=p1,p2]' -> [(subtrees, drops, path)]."""
    out = []
    for spec in load_specs or []:
        drop: List[str] = []
        if ";drop=" in spec:
            spec, dropstr = spec.split(";drop=")
            drop = dropstr.split(",")
        subtrees, path = spec.split("=", 1)
        out.append((tuple(subtrees.split(",")), tuple(drop), path))
    return out


def _init_variables(model, cfg, sample, seed):
    """Jitted full-tree init on the DEFAULT device.

    Jitted init on the TPU is one compile + one execution; forcing it onto
    the build host's single CPU core costs 5-10 minutes of XLA CPU compile
    per curriculum step. (The round-1 warning about minutes of init applied
    to EAGER init's per-op dispatch over the relay tunnel, not to jit.)
    """
    import jax
    from forge_tpu.models.forge import TrainFlags

    variables = jax.jit(
        lambda s: model.init({"params": jax.random.PRNGKey(seed)}, s,
                             method=model.init_all)
    )(sample)
    return jax.device_get(variables)


def cmd_train(args) -> int:
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from forge_tpu.config import update_config
    from forge_tpu.models import FORGE, build_model
    from forge_tpu.parallel import make_mesh, shard_batch
    from forge_tpu.data import Loader
    from forge_tpu.train import (
        create_train_state, make_train_step, get_curriculum_step)
    from forge_tpu.train.state import TrainState, make_optimizer
    from forge_tpu.train.trainer import train_epoch
    from forge_tpu.train.validation import make_validator
    from forge_tpu.utils.exp import create_logger
    from forge_tpu.utils import checkpoint as CKPT

    from forge_tpu.config import merge_config

    cfg = update_config(args.cfg)
    if args.epochs:
        cfg = merge_config(cfg, {"train": {"end_epoch": args.epochs}})
    if args.output_dir:
        cfg = merge_config(cfg, {"output_dir": args.output_dir})
    if args.batch_size:
        cfg = merge_config(cfg, {"train": {"batch_size": args.batch_size}})
    if args.img_size:
        cfg = merge_config(cfg, {"dataset": {"img_size": args.img_size}})
    if args.vis_freq >= 0:
        cfg = merge_config(cfg, {"vis_freq": args.vis_freq})
    if getattr(args, "resume", False):
        cfg = merge_config(cfg, {"train": {"resume": True}})
    if getattr(args, "lr", 0.0):
        cfg = merge_config(cfg, {"train": {"lr": args.lr}})
    logger, output_dir = create_logger(cfg, args.cfg, phase="train")
    logger.info(f"config: {args.cfg}; family={args.family}; "
                f"mode={cfg.train.parameter}")

    step_def = get_curriculum_step(args.family, cfg.train.parameter or "pose")
    model = build_model(cfg)

    train_ds = _build_dataset(cfg, "train", args.synthetic,
                              args.synthetic_seqs)
    # validation set size follows train/4 unless capped (--val-seqs): at
    # 512 train scenes a full 128-scene render-validation would dominate
    # short epochs
    val_n = getattr(args, "val_seqs", 0) or args.synthetic_seqs
    val_ds = _build_dataset(cfg, "test", args.synthetic, val_n)
    if (args.synthetic and len(train_ds) <= 1024
            and os.environ.get("FORGE_DEVICE_LOADER", "") == "1"):
        # opt-in: small synthetic sets live on-device (the relay tunnel is
        # ~7 MB/s, so per-step uploads cost seconds) — but resident scenes
        # compete with the train step's transient arena; a flagship b=4 step
        # OOMed with 32 resident 256^2 scenes, so the host loader is the
        # default. Beyond ~160 scenes the loader auto-compacts residency to
        # uint8 images / f16 depths (~3.2x; 512 scenes ~= 2 GB of 15.75).
        from forge_tpu.data import DeviceCachedLoader

        loader = DeviceCachedLoader(train_ds, cfg.train.batch_size,
                                    shuffle=True, seed=cfg.seed)
    else:
        loader = Loader(train_ds, cfg.train.batch_size, shuffle=True,
                        seed=cfg.seed)
    val_loader = Loader(val_ds, 1, drop_last=False)

    sample0 = next(iter(Loader(train_ds, 1)))
    sample0 = {k: v for k, v in sample0.items() if not isinstance(v, list)}

    variables = _init_variables(model, cfg, sample0, cfg.seed)

    # checkpoint surgery (--load); accepts both variables-only checkpoints
    # and full training checkpoints (cpt_last / cpt_best_*)
    for subtrees, drop, path in _parse_loads(args.load):
        raw = CKPT.load_checkpoint(path)
        if "variables" in raw:
            src = raw["variables"]
        else:
            st = raw["state"]
            src = {"params": st["params"], "batch_stats": st["batch_stats"]}
        variables = CKPT.load_subtrees(variables, src, subtrees, drop)
        logger.info(f"loaded {subtrees} (drop {drop}) from {path}")

    tx = make_optimizer(cfg, variables["params"], step_def)
    import jax.numpy as jnp
    from flax.core import FrozenDict

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(variables["params"]),
    )
    start_epoch = 0
    if cfg.train.resume:
        last = os.path.join(output_dir, "cpt_last")
        if os.path.exists(last):
            restored = CKPT.load_checkpoint(
                last, template={"state": jax.device_get(state),
                                "metadata": {"epoch": 0}})
            state = restored["state"]
            start_epoch = int(restored.get("metadata", {}).get("epoch", 0)) + 1
            logger.info(f"resumed from {last} at epoch {start_epoch}")

    n_dev = cfg.train.num_devices or len(jax.devices())
    ray = 2 if (cfg.render.ray_parallel and n_dev % 2 == 0 and n_dev > 1) else 1
    if cfg.render.ray_parallel and ray == 1:
        logger.info("render.ray_parallel requested but device count %d has no "
                    "ray axis; running data-parallel only", n_dev)
    mesh = make_mesh(n_dev, ray_parallel=ray)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state = jax.device_put(state, repl)

    perceptual_apply = None
    if cfg.loss.perceptual_img > 0 and step_def.loss in ("recon", "all", "all_nvs"):
        # frozen VGG16 perceptual net (reference DDP-wraps it,
        # kubric_train_joint.py:125); params are closure constants — load
        # converted torchvision weights when provided, else seeded random.
        from forge_tpu.models.perceptual import VGGPerceptualLoss

        ploss = VGGPerceptualLoss()
        with jax.default_device(jax.devices("cpu")[0]):
            s0 = jnp.zeros((1, 64, 64, 3))
            pvars = jax.jit(lambda a, b: ploss.init(
                jax.random.PRNGKey(7), a, b))(s0, s0)
        if args.vgg_checkpoint:
            import numpy as _np

            sd = dict(_np.load(args.vgg_checkpoint, allow_pickle=True))
            from forge_tpu.utils.convert_torch import convert_vgg16_blocks

            pvars = {"params": {"vgg": convert_vgg16_blocks(sd)}}
            logger.info(f"loaded VGG weights from {args.vgg_checkpoint}")
        pvars = jax.device_put(pvars, repl)

        def perceptual_apply(x, y):
            return ploss.apply(pvars, x, y)

    train_step = jax.jit(
        make_train_step(model, cfg, step_def, tx, perceptual_apply),
        in_shardings=(repl, data, repl, None),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    validate = make_validator(
        model, cfg, use_gt_pose=cfg.train.use_gt_pose,
        pose_source={"single": "3d", "pose2d": "2d",
                     "full": "2d3d"}[args.family])
    best = CKPT.BestTracker(output_dir)
    rng = jax.random.PRNGKey(cfg.seed)

    # train-time visualization every vis_freq iterations (reference:
    # scripts/kubric_trainer.py:85-101); pose-only steps render nothing.
    vis_fn = None
    if cfg.vis_freq > 0 and step_def.loss != "pose":
        from forge_tpu.models.forge import TrainFlags
        from forge_tpu.utils.vis import vis_seq, vis_seq_sv_mv

        fwd = (model.forward_single if args.family == "single"
               else model.forward_full)
        vis_render = jax.jit(
            lambda v, s: model.apply(v, s, TrainFlags.none(), method=fwd))

        def vis_fn(state, batch, epoch, it):
            vvars = {"params": state.params,
                     "batch_stats": state.batch_stats}
            small = jax.tree.map(lambda x: x[:1], batch)
            out = vis_render(vvars, small)
            imgs = np.asarray(out[0])[None]
            masks = np.asarray(out[1])[None]
            clips = np.asarray(small["images"])
            fg = np.asarray(small["fg_probabilities"])
            tag = f"{epoch}_{it}"
            if args.family == "single":
                vis_seq_sv_mv(clips[:, :5], fg[:, :5], imgs, masks,
                              tag, output_dir)
            else:
                tr = imgs.shape[1]
                vis_seq(clips[:, :tr], fg[:, :tr], imgs, masks,
                        tag, output_dir)

    # --profile captures a jax.profiler device trace of a few steady-state
    # steps to <output_dir>/profile (view with tensorboard / xprof; replaces
    # the reference's wall-clock-meters-only observability,
    # scripts/kubric_trainer.py:42-48)
    timer = None
    if getattr(args, "profile", False):
        from forge_tpu.utils.exp import StepTimer

        timer = StepTimer(profile_dir=os.path.join(output_dir, "profile"))
        logger.info(f"profiling steps 10-13 -> {output_dir}/profile")

    # cpt_last cadence: the reference saves every epoch
    # (kubric_train_pose_3D.py:166), but on the relay a save is a ~377 MB
    # device_get (~11 s) — for cheap pose-estimator epochs (~2 s) that is
    # 5x the training time, so long stages pass --save-every N.
    save_every = max(1, getattr(args, "save_every", 1) or 1)

    # The reference derives the epoch budget from train.total_iteration
    # (end_ep = total_iteration // steps_per_epoch + 1,
    # kubric_train_pose_3D.py:147) — its yaml end_epoch is dead config. The
    # published training budgets are iteration counts, so honor the same
    # derivation; an explicit --epochs flag wins (end_epoch already carries
    # it via the merge above), else take the tighter of the two bounds.
    steps_per_epoch = max(1, len(loader))
    end_epoch = cfg.train.end_epoch
    if not args.epochs and cfg.train.total_iteration > 0:
        end_epoch = min(
            end_epoch, cfg.train.total_iteration // steps_per_epoch + 1)
    logger.info(f"epoch budget: {end_epoch} "
                f"({steps_per_epoch} steps/epoch; total_iteration "
                f"{cfg.train.total_iteration}, end_epoch {cfg.train.end_epoch})")

    with jax.set_mesh(mesh):
        for epoch in range(start_epoch, end_epoch):
            state, rng, avg = train_epoch(
                cfg, loader, state, train_step, rng, epoch, mesh=mesh,
                logger=logger, vis_fn=vis_fn, timer=timer)
            if ((epoch + 1) % save_every == 0
                    or epoch == end_epoch - 1):
                CKPT.save_checkpoint(
                    os.path.join(output_dir, "cpt_last"), state,
                    {"epoch": epoch, **avg})
            if (epoch + 1) % max(1, args.val_every) == 0:
                vvars = {"params": state.params,
                         "batch_stats": state.batch_stats}
                vm = validate(jax.device_get(vvars), val_loader, logger)
                best.update(state, psnr=vm.get("psnr"), rot=vm.get("rot"))
    if timer is not None:
        timer.close()
    logger.info("training done")
    return 0


def cmd_eval(args) -> int:
    import jax

    from forge_tpu.config import update_config
    from forge_tpu.models import FORGE, build_model
    from forge_tpu.data import Loader
    from forge_tpu.eval.evaluate import run_optimization
    from forge_tpu.utils.exp import create_logger
    from forge_tpu.utils import checkpoint as CKPT

    cfg = update_config(args.cfg)
    if args.output_dir or args.img_size:
        from forge_tpu.config import merge_config

        if args.output_dir:
            cfg = merge_config(cfg, {"output_dir": args.output_dir})
        if args.img_size:
            cfg = merge_config(cfg, {"dataset": {"img_size": args.img_size}})
    logger, output_dir = create_logger(cfg, args.cfg, phase="eval")
    model = build_model(cfg)
    ds = _build_dataset(cfg, "test", args.synthetic,
                        getattr(args, "synthetic_seqs", 8))
    loader = Loader(ds, 1, drop_last=False)

    sample0 = next(iter(loader))
    sample0 = {k: v for k, v in sample0.items() if not isinstance(v, list)}
    variables = _init_variables(model, cfg, sample0, cfg.seed)
    if args.checkpoint:
        src = CKPT.load_checkpoint(args.checkpoint)
        st = src["state"]
        variables = {"params": st["params"], "batch_stats": st["batch_stats"]}
        logger.info(f"loaded checkpoint {args.checkpoint}")
    elif getattr(args, "torch_checkpoint", ""):
        # one-command released-weights eval (reference: kubric_eval.py:606-621
        # loads .pth.tar training checkpoints directly)
        from forge_tpu.utils.convert_forge import load_torch_checkpoint_file

        variables = load_torch_checkpoint_file(args.torch_checkpoint)
        logger.info(f"converted torch checkpoint {args.torch_checkpoint}")
    lpips_builder = None
    lpips_label = "lpips"
    if args.lpips:
        from forge_tpu.eval.lpips import init_lpips

        lp, lvars = init_lpips(jax.random.PRNGKey(3), cfg.dataset.img_size)
        # host-side copy: the builder re-uploads weights so the jitted
        # closure can be rebuilt after a TPU worker restart (evaluate.py
        # recover()); device buffers captured in a closure die with the worker
        host_params = jax.tree.map(np.asarray, lvars["params"])
        have_lin = have_vgg = False
        if args.lpips_checkpoint:
            from forge_tpu.utils.convert_torch import convert_lpips_lin

            lin = convert_lpips_lin(
                dict(np.load(args.lpips_checkpoint, allow_pickle=True)))
            host_params = {**host_params, **lin}
            have_lin = True
            logger.info(f"LPIPS lin weights from {args.lpips_checkpoint}")
        if args.vgg_checkpoint:
            from forge_tpu.utils.convert_torch import convert_lpips_vgg

            vgg = convert_lpips_vgg(
                dict(np.load(args.vgg_checkpoint, allow_pickle=True)))
            host_params = {**host_params, **vgg}
            have_vgg = True
            logger.info(f"LPIPS vgg weights from {args.vgg_checkpoint}")
        if not (have_lin and have_vgg):
            # label the column so readout never mistakes it for real LPIPS
            lpips_label = "lpips_unit"
        logger.info(f"LPIPS enabled (column '{lpips_label}')")

        def lpips_builder(lp=lp, host_params=host_params):
            lv = jax.device_put({"params": host_params})
            return jax.jit(lambda a, b: lp.apply(lv, a, b))
    variables_render = None
    if args.render_checkpoint:
        st = CKPT.load_checkpoint(args.render_checkpoint)["state"]
        variables_render = {"params": st["params"],
                            "batch_stats": st["batch_stats"]}
        logger.info(f"rendering with {args.render_checkpoint} (--model_gt)")
    elif getattr(args, "torch_render_checkpoint", ""):
        from forge_tpu.utils.convert_forge import load_torch_checkpoint_file

        variables_render = load_torch_checkpoint_file(
            args.torch_render_checkpoint)
        logger.info(f"rendering with converted torch checkpoint "
                    f"{args.torch_render_checkpoint} (--model_gt)")

    outfile = run_optimization(
        model, variables, loader, cfg, output_dir,
        lpips_builder=lpips_builder, lpips_label=lpips_label,
        split_num=args.split_num, exp_id=args.exp_id,
        use_sync=args.sync or args.sync_jit,
        sync_backend="jit" if args.sync_jit else "host",
        iter_num=args.iter_num,
        max_instances=args.max_instances,
        visualize=args.visualize,
        visualize_all=args.visualize_all,
        variables_render=variables_render,
        refine_batch=args.refine_batch,
        refine_multistart=args.refine_multistart,
    )
    from forge_tpu.eval.readout import summarize

    summarize(outfile, print_fn=logger.info)
    return 0


def cmd_demo(args) -> int:
    """Few real images -> pose estimation -> refinement -> turntable GIF.

    reference: demo.py:30-263 (pseudo-masks from intensity threshold,
    2000-iter refinement, 28-view 360 GIF).
    """
    import jax
    import jax.numpy as jnp

    from forge_tpu.config import update_config
    from forge_tpu.models import FORGE, TrainFlags, build_model
    from forge_tpu.eval.refine import make_refiner
    from forge_tpu.geometry.cameras import look_at_view_transform_cv2
    from forge_tpu.utils import checkpoint as CKPT
    from forge_tpu.utils.vis import vis_nvs
    from forge_tpu.utils.exp import create_logger

    cfg = update_config(args.cfg)
    logger, output_dir = create_logger(cfg, args.cfg, phase="demo")
    model = build_model(cfg)
    s = cfg.dataset.img_size

    if args.images and os.path.isdir(args.images):
        from PIL import Image

        files = sorted(
            f for f in os.listdir(args.images)
            if f.lower().endswith((".png", ".jpg", ".jpeg")))[:5]
        imgs = []
        for f in files:
            im = Image.open(os.path.join(args.images, f)).convert("RGB")
            imgs.append(np.asarray(im.resize((s, s), Image.LANCZOS),
                                   dtype=np.float32) / 255.0)
        clips = np.stack(imgs)[None]
    else:
        from forge_tpu.data import SyntheticVoxelDataset

        ds = SyntheticVoxelDataset(cfg, "test", n_seqs=1, grid=s // 2)
        clips = ds[0]["images"][None, :5]
    t = clips.shape[1]
    # pseudo-masks from intensity (reference: demo.py:119)
    masks = (clips.sum(-1, keepdims=True) > 0.05).astype(np.float32)
    f = 250.0 * s / 256.0  # hardcoded K (reference: demo.py:39)
    K = np.tile(np.array([[f, 0, s / 2], [0, f, s / 2], [0, 0, 1]], np.float32),
                (1, t, 1, 1))

    if args.checkpoint:
        st = CKPT.load_checkpoint(args.checkpoint)["state"]
        variables = {"params": st["params"], "batch_stats": st["batch_stats"]}
    else:
        import __graft_entry__ as ge

        variables = _init_variables(
            model, cfg, ge.synthetic_sample(cfg, b=1, t_all=10), cfg.seed)

    # Dual-model rendering (reference: demo.py:218-234 + README.md:99): pose
    # prediction and refinement use the joint checkpoint, but its fusion
    # degenerates after joint finetuning — the turntable fuse/render uses the
    # GT-pose model's weights while consuming the JOINT encoder's raw
    # feature volumes (exactly the reference's model/model_gt split; the
    # reference's `del encoder_traj.out.*` surgery is unnecessary here
    # because only the fuse/render subtrees of vr are ever applied).
    vr = variables
    if getattr(args, "render_checkpoint", ""):
        st = CKPT.load_checkpoint(args.render_checkpoint)["state"]
        vr = {"params": st["params"], "batch_stats": st["batch_stats"]}
        logger.info(f"rendering with {args.render_checkpoint} (demo model_gt)")

    encode = jax.jit(
        lambda v, x: model.apply(v, x, method=model.encode_and_predict_poses))
    features_raw, poses_cam, _ = encode(variables, jnp.asarray(clips))

    # chunked device programs (the hosted relay kills >~20 s executions)
    chunk = min(args.iter_num, 20)
    refiner = jax.jit(make_refiner(model, cfg, chunk))
    refined = poses_cam
    opt_state = None
    for _ in range(max(1, -(-args.iter_num // chunk))):
        refined, _, opt_state = refiner(
            variables, refined, features_raw,
            jnp.asarray(K), jnp.asarray(clips), jnp.asarray(masks), opt_state)

    # 360-degree turntable (reference: kubric_eval.py:190-232, 28 views)
    n_views = 28
    R, tt = look_at_view_transform_cv2(
        dist=np.full(n_views, cfg.render.camera_z),
        elev=np.zeros(n_views),
        azim=np.linspace(0, 360, n_views) + 180,
    )
    extr = np.tile(np.eye(4, dtype=np.float32), (1, n_views, 1, 1))
    extr[0, :, :3, :3] = R
    extr[0, :, :3, 3] = tt
    nvs_K = np.tile(K[:, :1], (1, n_views, 1, 1))
    render = jax.jit(lambda v, fr, pv, k, ne, nk: model.apply(
        v, fr, pv, k, TrainFlags.none(), False, ne, nk,
        method=model.fuse_render_from_rel))
    imgs, _ = render(vr, features_raw, refined, jnp.asarray(K),
                     jnp.asarray(extr), jnp.asarray(nvs_K))
    path = vis_nvs(np.asarray(imgs), "demo_360", output_dir)
    logger.info(f"wrote {path}")
    return 0


def cmd_readout(args) -> int:
    from forge_tpu.eval.readout import summarize

    summarize(args.results)
    return 0


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache for direct CLI invocations.

    Flagship train/eval programs take minutes to compile on the relay; the
    curriculum driver already exports JAX_COMPILATION_CACHE_DIR for its
    children, but a bare `python -m forge_tpu.run ...` got no cache. The
    explicit config.update matters: this environment's sitecustomize
    imports jax at interpreter start, so setting the env var here would be
    silently ignored in-process (observed Aug 21: 25 min of flagship
    compiles never cached).
    """
    import jax

    default = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "jax_comp_cache")
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR", default)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)  # for children
    jax.config.update("jax_compilation_cache_dir", path)
    if "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS" not in os.environ:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main(argv: Optional[List[str]] = None) -> int:
    _enable_compile_cache()
    p = argparse.ArgumentParser("forge_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    tp = sub.add_parser("train")
    tp.add_argument("--cfg", required=True)
    tp.add_argument("--family", default="full",
                    choices=["single", "full", "pose2d"])
    tp.add_argument("--synthetic", action="store_true")
    tp.add_argument("--output-dir", default="",
                    help="override cfg.output_dir")
    tp.add_argument("--synthetic-seqs", type=int, default=8,
                    help="train scenes for --synthetic (val = seqs/4)")
    tp.add_argument("--val-seqs", type=int, default=0,
                    help="cap the --synthetic validation set at n/4 of this "
                         "(0 = follow --synthetic-seqs)")
    tp.add_argument("--epochs", type=int, default=0)
    tp.add_argument("--batch-size", type=int, default=0,
                    help="override cfg.train.batch_size")
    tp.add_argument("--img-size", type=int, default=0,
                    help="override cfg.dataset.img_size")
    tp.add_argument("--val-every", type=int, default=10)
    tp.add_argument("--vis-freq", type=int, default=-1,
                    help="override cfg.vis_freq (0 disables train-time vis)")
    tp.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace of steps 10-13 to "
                         "<output_dir>/profile")
    tp.add_argument("--resume", action="store_true",
                    help="resume from <output_dir>/cpt_last if present "
                         "(cfg.train.resume; reference "
                         "utils/exp_utils.py:152-182)")
    tp.add_argument("--lr", type=float, default=0.0,
                    help="override cfg.train.lr (e.g. divergence recovery "
                         "at a lower rate, or single-chip batch retuning)")
    tp.add_argument("--save-every", type=int, default=1,
                    help="save cpt_last every N epochs (always at the last "
                         "epoch); a save is a full-state device_get, ~11 s "
                         "over the relay")
    tp.add_argument("--load", action="append", default=[],
                    help="subtree surgery: 'sub1,sub2=path[;drop=p1,p2]'")
    tp.add_argument("--vgg-checkpoint", default="",
                    help=".npz of torchvision vgg16 state dict for the "
                         "perceptual loss")
    tp.set_defaults(fn=cmd_train)

    ep = sub.add_parser("eval")
    ep.add_argument("--cfg", required=True)
    ep.add_argument("--checkpoint", default="")
    ep.add_argument("--synthetic", action="store_true")
    ep.add_argument("--synthetic-seqs", type=int, default=8)
    ep.add_argument("--output-dir", default="",
                    help="override cfg.output_dir")
    ep.add_argument("--img-size", type=int, default=0,
                    help="override cfg.dataset.img_size")
    ep.add_argument("--sync", action="store_true")
    ep.add_argument("--sync-jit", action="store_true",
                    help="run --sync through the jit-compiled f32 "
                         "synchronization instead of host float64")
    ep.add_argument("--split-num", type=int, default=1)
    ep.add_argument("--exp-id", type=int, default=0)
    ep.add_argument("--iter-num", type=int, default=1000)
    ep.add_argument("--max-instances", type=int, default=None)
    ep.add_argument("--refine-batch", type=int, default=1,
                    help="refine this many instances per jitted scan "
                    "(amortizes the b=1 fuse/render graph; metrics are "
                    "per-instance identical, only wall clock changes)")
    ep.add_argument("--refine-multistart", action="store_true",
                    help="refine ALL canonical-permutation candidates in "
                    "one batched scan and keep the lowest final photometric "
                    "loss (test-time-compute extension of the reference's "
                    "refine-best-candidate flow)")
    ep.add_argument("--visualize", action="store_true",
                    help="write before/after 360-degree turntable GIFs and "
                         "per-canonical nvs/inputs panels")
    ep.add_argument("--visualize-all", action="store_true",
                    help="additionally render turntables for every view-"
                         "subset fusion (reference visualize_360_all)")
    ep.add_argument("--lpips", action="store_true",
                    help="compute the LPIPS metric (VGG features)")
    ep.add_argument("--lpips-checkpoint", default="",
                    help=".npz of the lpips vgg.pth lin weights; without it "
                         "the column is labeled lpips_unit")
    ep.add_argument("--vgg-checkpoint", default="",
                    help=".npz of torchvision vgg16 state dict for the LPIPS "
                         "backbone")
    ep.add_argument("--render-checkpoint", default="",
                    help="second checkpoint whose fusion/render weights are "
                         "used for rendering (reference --model_gt)")
    ep.add_argument("--torch-checkpoint", default="",
                    help="released reference .pth(.tar) checkpoint; converted "
                         "inline (utils/convert_forge.py) — the one-command "
                         "released-weights eval path")
    ep.add_argument("--torch-render-checkpoint", default="",
                    help="released reference .pth(.tar) for the --model_gt "
                         "render weights, converted inline")
    ep.set_defaults(fn=cmd_eval)

    dp = sub.add_parser("demo")
    dp.add_argument("--cfg", required=True)
    dp.add_argument("--checkpoint", default="")
    dp.add_argument("--images", default="")
    dp.add_argument("--iter-num", type=int, default=2000)
    dp.add_argument("--render-checkpoint", default="",
                    help="second checkpoint whose fusion/render weights draw "
                         "the turntable (the reference demo's model_gt, "
                         "demo.py:218-234)")
    dp.set_defaults(fn=cmd_demo)

    rp = sub.add_parser("readout")
    rp.add_argument("--results", required=True)
    rp.set_defaults(fn=cmd_readout)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
