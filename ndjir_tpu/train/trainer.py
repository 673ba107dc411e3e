"""Per-scene training driver (reference: python/train.py:33-165).

One jitted+sharded train step does everything the reference's per-iteration
host loop did (sampling included); the host only feeds ray batches and
epoch-schedule scalars.  Extensions over the reference: full-state
checkpoint/resume, persistent compilation cache, multi-device ray sharding.
"""

from __future__ import annotations

import os
import shutil
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ndjir_tpu.config import Config, save_config
from ndjir_tpu.data.cameras import generate_raydir_camloc
from ndjir_tpu.data.dataset import IDRDataset
from ndjir_tpu.eval.image import psnr
from ndjir_tpu.models.fields import init_model
from ndjir_tpu.parallel.mesh import ShardingPlan
from ndjir_tpu.render.image import render_image
from ndjir_tpu.render.loss import total_loss
from ndjir_tpu.train import schedules
from ndjir_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from ndjir_tpu.train.optim import OptState, apply_updates, init_optimizer
from ndjir_tpu.utils.monitor import (
    Monitor,
    MonitorImage,
    MonitorSeries,
    MonitorTimeElapsed,
    logger,
)
from ndjir_tpu.utils.runtime import setup_compilation_cache


@partial(jax.jit, static_argnames=("conf",), donate_argnums=(0, 1))
def train_step(params, opt_state, camloc, raydir, color_gt, obj_mask,
               cos_anneal, lv_gain, lr_weight, lr_feat, step, conf,
               cdfs=None, proposal_grid=None):
    def lossfn(p):
        return total_loss(p, camloc, raydir, color_gt, obj_mask, cos_anneal,
                          lv_gain, conf, step=step, cdfs=cdfs,
                          proposal_grid=proposal_grid)

    (loss, monitors), grads = jax.value_and_grad(lossfn, has_aux=True)(params)
    params, opt_state, finite = apply_updates(
        params, grads, opt_state, lr_weight, lr_feat, conf)
    monitors["grads_finite"] = finite
    return params, opt_state, monitors


@partial(jax.jit, static_argnames=("conf",), donate_argnums=(0, 1))
def train_steps(params, opt_state, camloc, raydir, color_gt, obj_mask,
                cos_anneal, lv_gain, lr_weight, lr_feat, step0, conf,
                cdfs=None, proposal_grid=None):
    """K train steps in ONE jitted program (lax.scan over pre-staged
    batches with a leading (K, ...) axis).

    The reference re-feeds numpy and re-dispatches per iteration
    (train.py:124-148); on TPU that host round-trip caps throughput, so the
    epoch's ray batches are staged on device once and the whole
    sample->render->backward->update chain scans on-device.  Identical math
    to ``train_step`` (the scan body IS train_step); monitors come back
    stacked per step so per-iteration observability is preserved.
    """
    def body(carry, batch):
        p, s, i = carry
        cl, rd, cg, om = batch

        def lossfn(pp):
            return total_loss(pp, cl, rd, cg, om, cos_anneal, lv_gain, conf,
                              step=step0 + i, cdfs=cdfs,
                              proposal_grid=proposal_grid)

        (loss, monitors), grads = jax.value_and_grad(
            lossfn, has_aux=True)(p)
        p, s, finite = apply_updates(p, grads, s, lr_weight, lr_feat, conf)
        monitors["grads_finite"] = finite
        return (p, s, i + 1), monitors

    (params, opt_state, _), mons = jax.lax.scan(
        body, (params, opt_state, jnp.int32(0)),
        (camloc, raydir, color_gt, obj_mask))
    return params, opt_state, mons


def _is_dtu_data(data_path: str) -> bool:
    """reference: helper.py:137-138 (parent dir starts with 'DTU')."""
    parts = str(data_path).rstrip("/").split("/")
    return len(parts) >= 2 and parts[-2].startswith("DTU")


def setup_monitor_dir(conf, train: bool = True) -> str:
    """Create <monitor_base>_<scene> and snapshot the config
    (reference: helper.py:99-124)."""
    scene = str(conf.data_path).rstrip("/").split("/")[-1]
    monitor_path = f"{conf.monitor_base_path}_{scene}"
    conf.monitor_path = monitor_path
    if train:
        os.makedirs(monitor_path, exist_ok=True)
        save_config(conf, os.path.join(monitor_path, "config.yaml"))
        # snapshot the framework code for replayability
        # (reference: helper.py:113-118 copies python/ + csrc/)
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        for d in ("ndjir_tpu", "csrc"):
            src = os.path.join(repo, d)
            if os.path.isdir(src):
                shutil.copytree(
                    src, os.path.join(monitor_path, "code", d),
                    dirs_exist_ok=True,
                    ignore=shutil.ignore_patterns(
                        "__pycache__", "*.so", "*.pyc"))
    return monitor_path


class Trainer:
    def __init__(self, conf: Config, dataset: Optional[IDRDataset] = None):
        setup_compilation_cache()
        self.conf = conf
        self.monitor_path = setup_monitor_dir(conf, train=True)
        self.ds = dataset if dataset is not None else IDRDataset(
            conf, train=True, shuffle=True,
            process_index=jax.process_index())
        self.plan = ShardingPlan(conf)

        key = jax.random.PRNGKey(0)
        self.params = init_model(key, conf)
        self.opt_state = init_optimizer(self.params)
        self.params = self.plan.replicate(self.params)
        self.opt_state = self.plan.replicate(self.opt_state)

        self.lr_w_base, self.lr_f_base = schedules.scaled_base_lrs(conf)
        # fixed graph seeds => the MC uniforms are step-invariant; generate
        # them once here instead of re-running threefry inside every step
        self._cdfs = None
        if conf.renderer.fixed_graph_seeds:
            from ndjir_tpu.render.renderer import make_mc_cdfs
            self._cdfs = jax.jit(
                lambda: make_mc_cdfs(conf, conf.train.batch_size,
                                     conf.train.n_rays))()
        # coarse-grid proposal opt-in: cached SDF snapshot + jitted refresher
        self._proposal_grid = None
        self._proposal_refresh = None
        if conf.renderer.get("proposal_method", "network") == "coarse_grid":
            from ndjir_tpu.render.sampler import make_proposal_grid
            self._proposal_refresh = jax.jit(
                lambda p: make_proposal_grid(p, conf))
        self.start_epoch = 0
        self._maybe_resume()
        self._make_monitors()

    def _maybe_resume(self):
        ckpt_dir = os.path.join(self.monitor_path, "checkpoints")
        latest = latest_checkpoint(ckpt_dir)
        if latest:
            self.params, self.opt_state, extra = load_checkpoint(
                latest, self.params, self.opt_state)
            self.params = self.plan.replicate(self.params)
            self.opt_state = self.plan.replicate(self.opt_state)
            self.start_epoch = int(extra.get("step", 0)) + 1
            logger.info(f"Resumed from {latest} at epoch {self.start_epoch}")

    def _make_monitors(self):
        m = Monitor(self.monitor_path)
        names = ["Training loss", "RGB loss", "Eikonal loss", "TV loss",
                 "Mask loss", "Base color prior", "Roughness prior",
                 "Specular reflectance prior", "Std roughness reg",
                 "Std specular reflectance reg", "Gain"]
        keys = ["loss", "loss_rgb", "loss_eikonal", "loss_tv", "loss_mask",
                "prior_base_color", "prior_roughness",
                "prior_specular_reflectance", "reg_std_roughness",
                "reg_std_specular_reflectance", "gain"]
        self.series = {k: MonitorSeries(n, m, verbose=False)
                       for n, k in zip(names, keys)}
        self.monitor_time = MonitorTimeElapsed("Training time", m)
        Wl = self.ds.W // 2 ** self.conf.valid.n_down_samples
        Hl = self.ds.H // 2 ** self.conf.valid.n_down_samples
        self.monitor_psnr = MonitorSeries(f"PSNR {Wl}x{Hl}", m)
        self.monitor_image = MonitorImage(f"Rendered image {Wl}x{Hl}", m)

    # -- validation ---------------------------------------------------------
    def validate(self, epoch: int, final: bool = False):
        conf = self.conf
        idx = conf.valid.index % self.ds.size
        pose = self.ds.poses[idx:idx + 1]
        intrinsic = self.ds.intrinsics[idx:idx + 1]
        rimage = render_image(self.params, pose, intrinsic,
                              (self.ds.W, self.ds.H), conf,
                              lv_gain=schedules.light_visibility_gain(
                                  epoch, conf))
        dn = 2 ** conf.valid.n_down_samples
        gt = self.ds.images[idx][::dn, ::dn, :]
        gt = gt[np.newaxis].transpose(0, 3, 1, 2)
        h = min(gt.shape[2], rimage.shape[2])
        w = min(gt.shape[3], rimage.shape[3])
        self.monitor_image.add(epoch, rimage)
        self.monitor_psnr.add(epoch, psnr(rimage[:, :, :h, :w],
                                          gt[:, :, :h, :w]))
        try:
            from ndjir_tpu.extract.mc import extract_mesh_for_validation
            fpath = extract_mesh_for_validation(self.params, self.conf,
                                                self.monitor_path, epoch,
                                                final=final, dataset=self.ds)
        except Exception as e:  # extraction must never kill training
            logger.info(f"Mesh extraction failed (continuing): {e!r}")
            fpath = ""
        # DTU scenes: Chamfer on the final mesh (reference: train.py:114-118)
        if final and fpath and _is_dtu_data(conf.data_path):
            from ndjir_tpu.eval.chamfer import evaluate_by_chamfer

            conf.valid.dtumvs.mesh_path = fpath
            conf.valid.dtumvs.scan = str(conf.data_path).rstrip("/").split("/")[-1]
            conf.valid.dtumvs.vis_out_dir = self.monitor_path
            try:
                evaluate_by_chamfer(conf, dataset=self.ds)
            except Exception as e:
                logger.info(f"Chamfer evaluation skipped: {e}")

    # -- main loop ----------------------------------------------------------
    def train(self):
        conf = self.conf
        B = conf.train.batch_size
        E = conf.train.epoch
        iters = self.ds.iters_per_epoch
        ckpt_dir = os.path.join(self.monitor_path, "checkpoints")

        for epoch in range(self.start_epoch, E):
            if (epoch != 0 and conf.valid.epoch_interval > 0
                    and epoch % conf.valid.epoch_interval == 0
                    and not conf.valid.skip):
                self.validate(epoch)

            # reference parity: solvers.update_learning_rate(i) runs at the
            # END of epoch i (train.py:163), so epoch e trains with the
            # schedule evaluated at e-1, and epoch 0 uses the initial values
            # lr=0 / cos_anneal=0 / lv_gain=1 (solver.py:29, train.py:75-77)
            if epoch == 0:
                lr_w = lr_f = 0.0
                car, lvg = 0.0, 1.0
            else:
                lr_w = schedules.learning_rate(epoch - 1, self.lr_w_base, conf)
                lr_f = schedules.learning_rate(epoch - 1, self.lr_f_base, conf)
                car = schedules.cos_anneal_ratio(epoch - 1, conf)
                lvg = schedules.light_visibility_gain(epoch - 1, conf)

            # per-iteration monitors are collected as device futures (no
            # host sync inside the loop — the async dispatch pipeline stays
            # full) and fetched once per epoch (reference monitors every
            # iteration, train.py:150-161)
            sched = (jnp.asarray(car, jnp.float32), jnp.asarray(lvg, jnp.float32),
                     jnp.asarray(lr_w, jnp.float32), jnp.asarray(lr_f, jnp.float32))
            spc = int(conf.train.get("steps_per_call", 1))
            if self._proposal_refresh is not None:
                # refresh cadence bounds how many steps may fuse into one call
                spc = min(max(spc, 1), int(
                    conf.renderer.get("proposal_refresh_interval", 16)))
            epoch_mons: list = []
            it = 0
            while it < iters:
                gstep = epoch * iters + it
                if self._proposal_refresh is not None and gstep % int(
                        conf.renderer.get("proposal_refresh_interval", 16)) == 0:
                    self._proposal_grid = self._proposal_refresh(self.params)
                k = min(spc if spc > 0 else iters, iters - it)
                if k == 1:
                    color, mask, intrinsic, pose, xy = self.ds.next_batch(B)
                    raydir, camloc = generate_raydir_camloc(pose, intrinsic, xy)
                    camloc, raydir, color, mask = self.plan.shard_batch(
                        camloc, raydir, color, mask)
                    self.params, self.opt_state, mon = train_step(
                        self.params, self.opt_state, camloc, raydir, color,
                        mask, *sched, jnp.asarray(gstep, jnp.int32), conf,
                        cdfs=self._cdfs, proposal_grid=self._proposal_grid)
                    epoch_mons.append(mon)
                else:
                    # stage k batches on device, scan them in one program
                    bs = [self.ds.next_batch(B) for _ in range(k)]
                    rays = [generate_raydir_camloc(b[3], b[2], b[4])
                            for b in bs]
                    camloc = np.stack([r[1] for r in rays])
                    raydir = np.stack([r[0] for r in rays])
                    color = np.stack([b[0] for b in bs])
                    mask = np.stack([b[1] for b in bs])
                    camloc, raydir, color, mask = self.plan.shard_batch_steps(
                        camloc, raydir, color, mask)
                    self.params, self.opt_state, mons = train_steps(
                        self.params, self.opt_state, camloc, raydir, color,
                        mask, *sched, jnp.asarray(gstep, jnp.int32), conf,
                        cdfs=self._cdfs, proposal_grid=self._proposal_grid)
                    epoch_mons.extend(
                        jax.tree_util.tree_map(lambda a, j=j: a[j], mons)
                        for j in range(k))
                it += k

            epoch_mons = jax.device_get(epoch_mons)
            for it, m in enumerate(epoch_mons):
                gstep = epoch * iters + it
                for k, s in self.series.items():
                    s.add(gstep, m[k])
                if not bool(m["grads_finite"]):
                    logger.info(
                        f"Non-finite grads at epoch {epoch} iter {it} "
                        "(update skipped)")
            mean_loss = float(np.mean([m["loss"] for m in epoch_mons]))
            logger.info(f"epoch {epoch}: loss={mean_loss:.6g}")
            self.monitor_time.add(epoch)

            if (conf.train.checkpoint_interval_epochs > 0
                    and (epoch + 1) % conf.train.checkpoint_interval_epochs == 0):
                save_checkpoint(ckpt_dir, epoch, self.params, self.opt_state,
                                keep=conf.train.keep_checkpoints)

        save_checkpoint(ckpt_dir, E - 1, self.params, self.opt_state,
                        keep=conf.train.keep_checkpoints)
        if not conf.valid.skip:
            self.validate(E - 1, final=True)
        return self.params
