"""Device mesh + sharding plan: rays shard over (data x rays) axes.

The reference is strictly single-GPU (SURVEY.md section 2.7); scale-out here
is TPU-native: a 2-D ``jax.sharding.Mesh`` whose first axis shards the image
batch (data parallel) and second axis shards the ray axis (the workload's
sequence-parallel analog).  Parameters are replicated; XLA inserts the
gradient all-reduce over ICI automatically from the sharding annotations and
overlaps it with the backward pass.

Multi-host: the same program runs under ``jax.distributed.initialize()``;
each host calls ``shard_batch`` with its full-size host array and
``jax.device_put`` distributes it over the global named sharding.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class ShardingPlan:
    def __init__(self, conf, devices=None):
        shape = tuple(conf.parallel.mesh_shape)
        names = tuple(conf.parallel.axis_names)
        devices = devices if devices is not None else jax.devices()
        n_needed = int(np.prod(shape))
        if n_needed > len(devices):
            raise ValueError(
                f"mesh_shape {shape} needs {n_needed} devices, "
                f"have {len(devices)}")
        dev_array = np.asarray(devices[:n_needed]).reshape(shape)
        self.mesh = Mesh(dev_array, names)
        self.names = names
        self.is_trivial = n_needed == 1

    # -- shardings ----------------------------------------------------------
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def batch_sharding(self, ndim: int) -> NamedSharding:
        """(B, R, ...) arrays: B over data axis, R over rays axis."""
        spec = [self.names[0], self.names[1]] + [None] * (ndim - 2)
        return NamedSharding(self.mesh, P(*spec))

    def data_sharding(self, ndim: int) -> NamedSharding:
        """(B, ...) arrays: B over data axis only (e.g. camloc)."""
        spec = [self.names[0]] + [None] * (ndim - 1)
        return NamedSharding(self.mesh, P(*spec))

    def shard_batch(self, camloc, raydir, color_gt, obj_mask) -> Tuple[Any, ...]:
        if self.is_trivial:
            return camloc, raydir, color_gt, obj_mask
        put = jax.device_put
        return (put(camloc, self.data_sharding(2)),
                put(raydir, self.batch_sharding(3)),
                put(color_gt, self.batch_sharding(3)),
                put(obj_mask, self.batch_sharding(3)))

    def shard_batch_steps(self, camloc, raydir, color_gt, obj_mask
                          ) -> Tuple[Any, ...]:
        """Pre-staged multi-step batches (K, B, ...): steps axis replicated,
        B/R sharded as usual (for the lax.scan train_steps path)."""
        if self.is_trivial:
            return camloc, raydir, color_gt, obj_mask
        put = jax.device_put

        def steps(spec_fn, ndim):
            inner = spec_fn(ndim).spec
            return NamedSharding(self.mesh, P(None, *inner))

        return (put(camloc, steps(self.data_sharding, 2)),
                put(raydir, steps(self.batch_sharding, 3)),
                put(color_gt, steps(self.batch_sharding, 3)),
                put(obj_mask, steps(self.batch_sharding, 3)))

    def replicate(self, tree):
        if self.is_trivial:
            return tree
        return jax.device_put(tree, self.replicated())
