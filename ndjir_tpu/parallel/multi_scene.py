"""Multi-scene batch training across a TPU mesh.

The reference trains one scene per GPU process (SURVEY.md section 2.7: no
distributed code at all).  TPU-native scale-out axis #2: train S independent
scenes SIMULTANEOUSLY on one pod slice — per-scene parameter pytrees stacked
on a leading scene axis that shards over the mesh's 'data' axis, with each
scene's rays sharded over the 'rays' axis.  The whole thing is a single
vmapped+jitted program: XLA splits the scene axis across device groups, so
S scenes train at near-perfect efficiency with zero cross-scene traffic
(parameters never sync; only the program is shared).

Multi-host: call :func:`initialize_distributed` first; every process runs
the same program and feeds the process-local shard of the scene/ray batch.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ndjir_tpu.config import Config
from ndjir_tpu.data.cameras import generate_raydir_camloc
from ndjir_tpu.data.dataset import IDRDataset
from ndjir_tpu.models.fields import init_model
from ndjir_tpu.parallel.mesh import ShardingPlan
from ndjir_tpu.render.loss import total_loss
from ndjir_tpu.train import schedules
from ndjir_tpu.train.optim import apply_updates, init_optimizer
from ndjir_tpu.utils.monitor import logger


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (jax distributed runtime over ICI/DCN).

    With no arguments, uses the TPU environment's auto-detection.
    """
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    logger.info(f"distributed: process {jax.process_index()} / "
                f"{jax.process_count()}, {jax.device_count()} devices")


@partial(jax.jit, static_argnames=("conf",), donate_argnums=(0, 1))
def multi_scene_train_step(params_s, opt_state_s, camloc, raydir, color_gt,
                           obj_mask, cos_anneal, lv_gain, lr_weight, lr_feat,
                           step, conf):
    """vmapped train step over the leading scene axis.

    params_s: pytree with leaves stacked (S, ...); batch arrays (S, B, R, .).
    """
    def one_scene(params, opt_state, camloc, raydir, color_gt, obj_mask):
        def lossfn(p):
            return total_loss(p, camloc, raydir, color_gt, obj_mask,
                              cos_anneal, lv_gain, conf, step=step)
        (loss, monitors), grads = jax.value_and_grad(
            lossfn, has_aux=True)(params)
        params, opt_state, finite = apply_updates(
            params, grads, opt_state, lr_weight, lr_feat, conf)
        monitors["grads_finite"] = finite
        return params, opt_state, monitors

    return jax.vmap(one_scene)(params_s, opt_state_s, camloc, raydir,
                               color_gt, obj_mask)


class MultiSceneTrainer:
    """Train S scenes in one program; scenes shard over the 'data' mesh axis.

    ``conf.parallel.mesh_shape`` = [n_scene_groups, n_ray_shards]; S must be
    divisible by n_scene_groups.
    """

    def __init__(self, conf: Config, scene_paths: List[str],
                 datasets: Optional[List[IDRDataset]] = None):
        self.conf = conf
        self.scene_paths = scene_paths
        S = len(scene_paths)
        self.plan = ShardingPlan(conf)
        mesh = self.plan.mesh

        if datasets is not None:
            self.datasets = datasets
        else:
            self.datasets = []
            for p in scene_paths:
                c = Config(conf.to_dict())
                c.data_path = p
                self.datasets.append(IDRDataset(
                    c, train=True, shuffle=True,
                    process_index=jax.process_index()))

        # per-scene params stacked on a sharded leading axis
        keys = jax.random.split(jax.random.PRNGKey(0), S)
        params_list = [init_model(k, conf) for k in keys]
        opt_list = [init_optimizer(p) for p in params_list]
        stack = lambda trees: jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *trees)
        self.params_s = stack(params_list)
        self.opt_state_s = stack(opt_list)

        self.params_s = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(
                mesh, P(self.plan.names[0], *([None] * (x.ndim - 1))))),
            self.params_s)
        self.opt_state_s = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(
                mesh, P(self.plan.names[0], *([None] * (x.ndim - 1))))),
            self.opt_state_s)
        self.lr_w_base, self.lr_f_base = schedules.scaled_base_lrs(conf)

    def _batch_sharding(self, ndim):
        # (S, B, R, ...): scenes over data axis, rays over rays axis
        spec = [self.plan.names[0], None, self.plan.names[1]] \
            + [None] * (ndim - 3)
        return NamedSharding(self.plan.mesh, P(*spec))

    def next_batch(self):
        B = self.conf.train.batch_size
        cams, rays, colors, masks = [], [], [], []
        for ds in self.datasets:
            color, mask, intrinsic, pose, xy = ds.next_batch(B)
            raydir, camloc = generate_raydir_camloc(pose, intrinsic, xy)
            cams.append(camloc)
            rays.append(raydir)
            colors.append(color)
            masks.append(mask)
        camloc = np.stack(cams)
        raydir = np.stack(rays)
        color = np.stack(colors)
        mask = np.stack(masks)
        put = jax.device_put
        return (put(camloc, NamedSharding(self.plan.mesh,
                                          P(self.plan.names[0], None, None))),
                put(raydir, self._batch_sharding(4)),
                put(color, self._batch_sharding(4)),
                put(mask, self._batch_sharding(4)))

    def train(self, epochs: Optional[int] = None) -> Dict[str, Any]:
        conf = self.conf
        E = epochs if epochs is not None else conf.train.epoch
        iters = min(ds.iters_per_epoch for ds in self.datasets)
        mon = {}
        for epoch in range(E):
            # schedule(e-1) with epoch-0 initial values (reference parity;
            # see Trainer.train)
            if epoch == 0:
                lr_w = lr_f = 0.0
                car, lvg = 0.0, 1.0
            else:
                lr_w = schedules.learning_rate(epoch - 1, self.lr_w_base, conf)
                lr_f = schedules.learning_rate(epoch - 1, self.lr_f_base, conf)
                car = schedules.cos_anneal_ratio(epoch - 1, conf)
                lvg = schedules.light_visibility_gain(epoch - 1, conf)
            for it in range(iters):
                camloc, raydir, color, mask = self.next_batch()
                self.params_s, self.opt_state_s, mon = multi_scene_train_step(
                    self.params_s, self.opt_state_s, camloc, raydir, color,
                    mask, jnp.float32(car), jnp.float32(lvg),
                    jnp.float32(lr_w), jnp.float32(lr_f),
                    jnp.asarray(epoch * iters + it, jnp.int32), conf)
            losses = np.asarray(mon["loss"])
            logger.info(f"[multi-scene] epoch {epoch}: losses {losses}")
        return mon

    def scene_params(self, i: int):
        """Unstack scene i's parameter pytree (e.g. for extraction)."""
        return jax.tree_util.tree_map(lambda x: x[i], self.params_s)
