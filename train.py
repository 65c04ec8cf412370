"""Training CLI - twin of reference train.py:172-274.

Artifacts match the reference layout: cfg.json, copied transforms/bounding
boxes, point_cloud/iteration_N/point_cloud.ply, time.txt, num_gaussians.txt,
{split}_validation_scores.csv, preview PNG grids, tensorboard scalars.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict
from datetime import datetime
from random import randint

import numpy as np

from editable_gaussian_reflections_tpu.config import Config, parse_config
from editable_gaussian_reflections_tpu.ops.gaussian_kernel import MAX_BOUNCES
from editable_gaussian_reflections_tpu.ops.tonemap import tonemap
from editable_gaussian_reflections_tpu.renderer.render import camera_params, render
from editable_gaussian_reflections_tpu.renderer.raytracer import RenderSettings
from editable_gaussian_reflections_tpu.scene.init import farfield_arrays
from editable_gaussian_reflections_tpu.scene.scene import Scene
from editable_gaussian_reflections_tpu.training import (
    append_with_opt_state,
    init_train_state,
    lr_tree,
    pick_tile_size,
    prune_step,
    settings_from_config,
    targets_from_camera,
    train_step,
    use_pallas_backend,
)
from editable_gaussian_reflections_tpu.utils.general import set_seeds
from editable_gaussian_reflections_tpu.utils.image import psnr, save_image_grid


def prepare_output_and_logger(cfg: Config):
    """train.py:34-71."""
    if not cfg.model_path:
        cfg.model_path = os.path.join(
            "output", datetime.now().isoformat(timespec="seconds")
        )
    os.makedirs(cfg.model_path, exist_ok=True)
    for name in ("transforms_train.json", "transforms_test.json",
                 "bounding_boxes.json"):
        src = os.path.join(cfg.source_path, name)
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(cfg.model_path, name))
    with open(os.path.join(cfg.model_path, "cfg.json"), "w") as f:
        json.dump(asdict(cfg), f, indent=2)
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(cfg.model_path)
    except Exception:
        return None


def _np_tonemap(x):
    import jax.numpy as jnp
    return np.asarray(tonemap(jnp.asarray(x, jnp.float32)))


def training_report(cfg, scene, state, tb_writer, iteration, start_time,
                    settings, num_bounces, max_clusters=None):
    """train.py:75-169: time.txt, num_gaussians.txt, per-split PSNR +
    validation CSVs + preview grids."""
    delta = time.time() - start_time
    with open(os.path.join(cfg.model_path, "time.txt"), "a") as f:
        f.write("\n[ITER {}] elapsed {}".format(
            iteration, time.strftime("%H:%M:%S", time.gmtime(delta))))
    from editable_gaussian_reflections_tpu.scene.init import num_live
    n_live = num_live(state.scene)
    with open(os.path.join(cfg.model_path, "num_gaussians.txt"), "a") as f:
        f.write(f"\n[ITER {iteration}] # {n_live}")

    configs = [{
        "name": "train",
        "cameras": [sorted(scene.getTrainCameras(), key=lambda x: x.image_name)[
            min(cfg.val_view, (cfg.max_images or len(scene.getTrainCameras())) - 1)
        ]],
    }]
    if len(scene.getTestCameras()) > 0:
        configs.append({"name": "test", "cameras": scene.getTestCameras()})

    for vc in configs:
        scores = np.zeros(3)
        overflow_frac = 0.0
        for idx, viewpoint in enumerate(vc["cameras"]):
            from editable_gaussian_reflections_tpu.renderer.render import (
                default_backend_kwargs,
            )
            bk = default_backend_kwargs(cfg)
            if max_clusters and bk.get("use_culling"):
                # the training step's budget grows at far-field injection
                # (see the cull_kw resize below); the EVAL render must match
                # or the reported PSNR/cull_overflow measure an artificially
                # starved render (r4's "diffuse decay" was partly this -
                # eval overflow held at 0.12-0.14 post-injection while the
                # training gradients were already fixed)
                bk["max_clusters"] = max(bk["max_clusters"], max_clusters)
            pkg = render(
                viewpoint, state.scene, settings,
                num_bounces=num_bounces, max_hits=cfg.max_hits,
                chunk=cfg.trace_chunk, tile=cfg.ray_tile, denoise=True,
                **bk,
            )
            diffuse = np.clip(_np_tonemap(pkg.rgb[0]), 0, 1)
            specular = np.clip(_np_tonemap(pkg.rgb[1:].sum(0)), 0, 1)
            pred = np.clip(_np_tonemap(pkg.final), 0, 1)
            d_gt = np.clip(_np_tonemap(pkg.target_diffuse), 0, 1)
            s_gt = np.clip(_np_tonemap(pkg.target_specular), 0, 1)
            gt = np.clip(_np_tonemap(pkg.target), 0, 1)
            scores += [psnr(diffuse, d_gt), psnr(specular, s_gt), psnr(pred, gt)]
            overflow_frac += pkg.overflow_frac
            if idx == 0:
                hwc = lambda a: a.transpose(1, 2, 0)
                save_image_grid(
                    [hwc(diffuse), hwc(d_gt), hwc(specular), hwc(s_gt),
                     hwc(pred), hwc(gt)],
                    os.path.join(cfg.model_path,
                                 f"{vc['name']}_preview_iteration_{iteration}.png"),
                    nrow=2,
                )
        scores /= len(vc["cameras"])
        overflow_frac /= len(vc["cameras"])
        print(f"\n[ITER {iteration}] Evaluating {vc['name']}: "
              f"PSNR {scores[2]:.2f} (diffuse {scores[0]:.2f} / specular {scores[1]:.2f})"
              f" cull_overflow {overflow_frac:.4f}")
        if tb_writer:
            tb_writer.add_scalar(vc["name"] + "/loss_viewpoint - psnr", scores[2], iteration)
            tb_writer.add_scalar(vc["name"] + "/loss_viewpoint - specular_psnr", scores[1], iteration)
            tb_writer.add_scalar(vc["name"] + "/loss_viewpoint - diffuse_psnr", scores[0], iteration)
        with open(os.path.join(cfg.model_path,
                               f"{vc['name']}_validation_scores.csv"), "a") as f:
            f.write(f"{iteration}, {scores[0]:02.2f}, {scores[1]:02.2f}, {scores[2]:02.2f}\n")


def main(cfg: Config, resume: bool = False):
    import jax
    import jax.numpy as jnp

    from editable_gaussian_reflections_tpu.checkpoint import (
        checkpoint_path,
        latest_checkpoint,
        load_train_state,
        save_train_state,
    )

    seed = set_seeds()
    key = jax.random.PRNGKey(seed)

    tb_writer = prepare_output_and_logger(cfg)
    scene = Scene(cfg)
    first_iter = 1
    ckpt = latest_checkpoint(cfg.model_path) if resume else None
    if ckpt:
        state = load_train_state(ckpt)
        first_iter = int(ckpt.split("_")[-1]) + 1
        print(f"resumed from {ckpt} at iteration {first_iter}")
    else:
        state = init_train_state(scene.gaussians)
    settings = settings_from_config(cfg)

    cameras = scene.getTrainCameras()
    W, H = cameras[0].image_width, cameras[0].image_height
    tile = pick_tile_size(W * H, cfg.ray_tile)
    # stage targets once (device memory permitting) to avoid per-step H2D
    targets_cache = {}

    viewpoint_stack = list(range(len(cameras)))
    use_pallas = use_pallas_backend(cfg)
    exp_power_static = float(cfg.exp_power)
    # culling requires tiles that divide the frame and chunk-aligned clusters
    use_culling = (
        use_pallas and cfg.cull
        and (W * H) % cfg.cull_tile == 0
        and tile % cfg.cull_tile == 0
        and state.scene.capacity % cfg.cull_cluster == 0
    )
    cull_kw = dict(use_culling=use_culling, cull_tile=cfg.cull_tile,
                   cull_cluster=cfg.cull_cluster,
                   max_clusters=cfg.max_clusters,
                   split_far=getattr(cfg, "split_far", False),
                   mc_far=getattr(cfg, "mc_far", 32),
                   max_hits_far=getattr(cfg, "max_hits_far", 0),
                   split_radius_scale=getattr(cfg, "split_radius_scale", 1.5))
    start_time = time.time()
    if first_iter > 1:
        # resume: keep time.txt CUMULATIVE across restarts by offsetting the
        # timer with the last recorded elapsed (round-2 parity artifacts had
        # per-process elapsed, which made the trajectory unauditable)
        try:
            with open(os.path.join(cfg.model_path, "time.txt")) as f:
                last = f.read().strip().splitlines()[-1]
            h, m, s = last.split("elapsed")[-1].strip().split(":")
            start_time -= int(h) * 3600 + int(m) * 60 + int(s)
        except (OSError, ValueError, IndexError):
            pass
    num_bounces = 0 if cfg.no_bounces_until_iter > 0 else min(MAX_BOUNCES, 2)
    if first_iter > max(cfg.no_bounces_until_iter, 0):
        # resuming past the warmup boundary: bounces already enabled and the
        # far-field shell is already in the checkpointed state
        num_bounces = min(MAX_BOUNCES, 2)
        if use_culling and cfg.no_bounces_until_iter > 0:
            # reapply the injection-time candidate-budget growth (the shell
            # is in the checkpoint; estimate its share from the config)
            cap = state.scene.capacity
            grow = cap / max(cap - cfg.init_num_pts_farfield, 1)
            mc = -(-int(cfg.max_clusters * grow) // 64) * 64
            cull_kw["max_clusters"] = max(cull_kw["max_clusters"], mc)

    rng = np.random.default_rng(seed)
    hyper = dict(beta_1=cfg.beta_1, beta_2=cfg.beta_2,
                 scale_decay=cfg.scale_decay, apply_grads=1.0)

    viewer_state = None
    if cfg.viewer:
        # live training viewer over websockets (reference train.py:189-198
        # spawns the imgui viewer thread; here the headless render service)
        from threading import Thread

        from editable_gaussian_reflections_tpu.scene.editable import (
            EditableGaussianScene,
        )
        from editable_gaussian_reflections_tpu.viewer.service import (
            RenderService,
        )
        from editable_gaussian_reflections_tpu.viewer.state import ViewerState

        viewer_state = ViewerState(
            EditableGaussianScene(state.scene), cfg,
            width=min(W, 512), height=min(H, 512), fovy=cameras[0].FoVy,
            settings=settings,
        )
        Thread(target=RenderService(viewer_state).serve, daemon=True).start()

    for iteration in range(first_iter, cfg.iterations + 1):
        if not viewpoint_stack:
            viewpoint_stack = list(range(len(cameras)))
        cam_idx = viewpoint_stack.pop(randint(0, len(viewpoint_stack) - 1))
        cam = cameras[cam_idx]
        if cam_idx not in targets_cache:
            targets_cache[cam_idx] = jax.tree_util.tree_map(
                jnp.asarray, targets_from_camera(cam)
            )
        targets = targets_cache[cam_idx]
        cp = camera_params(cam, znear=cam.znear, zfar=cam.zfar)

        lrs = lr_tree(cfg, iteration, scene.cameras_extent)
        prune_now = (
            iteration % cfg.pruning_interval == 0
            and iteration > cfg.pruning_start_iter
            and cfg.min_weight > 0
        )
        znear_prune_now = (
            iteration % cfg.pruning_interval == 0
            and not cfg.disable_znear_densif_pruning
        )

        hyper["apply_grads"] = 1.0
        key, step_key = jax.random.split(key)
        # render + backward + (prune handled between) + adam + clamps
        if prune_now or znear_prune_now:
            # reference order: render happens first (train.py:221), then
            # pruning (238-245) kills slots AND zeroes this step's grads
            # (prune_points resets .grad), then the optimizer step runs.
            state2, metrics = train_step(
                state, cp, targets, settings, lrs,
                {**hyper, "apply_grads": 0.0}, step_key,
                W, H, num_bounces, cfg.max_hits, cfg.trace_chunk, tile,
                use_pallas=use_pallas, exp_power_static=exp_power_static,
                **cull_kw,
            )
            kill = jnp.zeros(state.scene.capacity, bool)
            if prune_now:
                kill = kill | (
                    state2.total_weight / cfg.pruning_interval < cfg.min_weight
                )
            if znear_prune_now:
                from editable_gaussian_reflections_tpu.scene.init import znear_prune_mask
                centers, znears = scene.camera_centers_znears()
                kill = kill | znear_prune_mask(state2.scene, centers, znears)
            kill = kill & state2.scene.live_mask
            state = prune_step(state2, kill)
        else:
            state, metrics = train_step(
                state, cp, targets, settings, lrs, hyper, step_key,
                W, H, num_bounces, cfg.max_hits, cfg.trace_chunk, tile,
                use_pallas=use_pallas, exp_power_static=exp_power_static,
                **cull_kw,
            )

        if viewer_state is not None:
            viewer_state.gaussians.base = state.scene
            viewer_state.gaussians.is_dirty = True
            viewer_state.gaussians._cached = None

        if iteration % 100 == 0:
            # drain the async dispatch queue so elapsed times are honest and
            # the host can't run unboundedly ahead of the device (on lazy
            # backends the host otherwise reaches eval milestones minutes
            # before the device finishes the queued steps)
            float(metrics["l1_diffuse"])

        if iteration in cfg.test_iterations:
            training_report(cfg, scene, state, tb_writer, iteration,
                            start_time, settings, num_bounces,
                            max_clusters=cull_kw.get("max_clusters"))
        if iteration in cfg.save_iterations:
            print(f"\n[ITER {iteration}] Saving Gaussians")
            scene.save(iteration, state.scene)
            # full-state checkpoint (params + Adam moments) for mid-training
            # resume - beyond the reference's PLY-only checkpoints
            try:
                save_train_state(checkpoint_path(cfg.model_path, iteration),
                                 state)
            except Exception as e:  # noqa: BLE001 - checkpointing is best-effort
                print(f"[checkpoint] skipped: {e}")

        # * bounce warmup end: restore bounces + inject far-field shell
        if iteration == cfg.no_bounces_until_iter or (
            iteration == 1 and cfg.no_bounces_until_iter in (-1, 0)
        ):
            num_bounces = min(MAX_BOUNCES, 2)
            centers, znears = scene.camera_centers_znears()
            new = farfield_arrays(cfg, scene.cameras_extent, centers, znears, rng)
            prev_capacity = state.scene.capacity
            state = append_with_opt_state(state, new,
                                          pad_multiple=cfg.trace_chunk)
            print(f"[ITER {iteration}] far-field injection -> capacity "
                  f"{state.scene.capacity}")
            if use_culling:
                # Grow the per-tile candidate budget with the cluster count:
                # the shell surrounds every camera, so each tile cone newly
                # sees ~its share of capacity/cull_cluster extra clusters.
                # Without this, cull_overflow spiked to 0.13-0.16 for the
                # ~500 iters until pruning thinned the shell (r4 parity run)
                # - i.e. starved, silently-biased gradients right when the
                # far field must learn.  One recompile; mc is static in the
                # jitted step.  (The reference's OptiX BVH traversal has no
                # candidate cap to resize - this is the TPU analog's dual.)
                grow = state.scene.capacity / max(prev_capacity, 1)
                mc = -(-int(cfg.max_clusters * grow) // 64) * 64
                if mc > cull_kw["max_clusters"]:
                    cull_kw["max_clusters"] = mc
                    print(f"[ITER {iteration}] candidate budget "
                          f"max_clusters {cfg.max_clusters} -> {mc}")

    print("\nTraining complete.")
    return state


if __name__ == "__main__":
    import sys
    resume = "--resume" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--resume"]
    cfg = parse_config(argv, prog="train")
    if cfg.viewer:
        cfg.test_iterations = []
    main(cfg, resume=resume)
