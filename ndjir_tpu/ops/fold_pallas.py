"""Pallas TPU kernel for the octa cotangent fold (the backward of the
duplicated-table build).

The fold maps the backward scatter's (8D, G^3) f32 cotangent back to the
(Gx, Gy, Gz, D) base table.  Chip A/Bs (docs/probe_grid_bwd.json) showed
every XLA formulation is materialization-bound — the best (flat2d lane
shifts, ops/grid.py:_fold_halve_flat) costs 27.4 ms at G=256 against
~4 ms of logical HBM time — because XLA materializes each halving pass.

This kernel does all three halving passes in VMEM on lane blocks of the
flat G^3 axis.  Every duplicated-corner shift is a +1 step along one grid
axis, i.e. a LANE offset of {Gy*Gz, Gz, 1} in the flat layout, so a block
that also holds HALO = Gy*Gz + Gz + 128 extra leading lanes can compute
the complete x→y→z fold chain of its C output lanes without neighbor
communication: lane l needs inputs no further than l − (Gy*Gz + Gz + 1)
back, and halo lanes ≥ Gy*Gz are themselves fold-correct by the same
argument (junk below that never propagates into the kept window).  The
head block zeroes its halo (nothing before lane 0); validity masks
(coord >= 1) are iota-derived so they cost no HBM.

Traffic: reads (1 + HALO/C) * 2.1 GB + writes 268 MB at G=256 ≈ 4 ms at
speed of light vs 27.4 ms for the XLA form.

Gating: lane geometry must keep every DMA 128-aligned — Gz and Gy*Gz
multiples of 128 and G^3 divisible by the block size.  G=256 (the octa
production grid) qualifies; others fall back to the XLA flat2d form.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = bool(os.environ.get("NDJIR_PALLAS_INTERPRET"))
_BLOCK = int(os.environ.get("NDJIR_FOLD_BLOCK", 131072))   # output lanes


def _shift_term(v, delta, keep, coordmask):
    """v (C, W) shifted right by ``delta`` lanes, masked to valid targets.

    keep/coordmask are (1, W) bool: ``keep`` kills the first ``delta``
    lanes (no wrap source), ``coordmask`` is the folded-axis validity
    (coord >= 1)."""
    W = v.shape[1]
    shifted = jnp.concatenate(
        [jnp.zeros((v.shape[0], delta), v.dtype), v[:, :W - delta]], axis=1)
    return jnp.where(keep & coordmask, shifted, jnp.zeros((), v.dtype))


def _fold_kernel(in_hbm, out_ref, buf, sem_h, sem_b, *, block, halo,
                 gshape, d):
    Gx, Gy, Gz, _ = gshape
    k = pl.program_id(0)
    start = k * block

    # halo DMA (previous lanes); the head block zeroes it instead
    @pl.when(k == 0)
    def _():
        buf[:, :halo] = jnp.zeros_like(buf[:, :halo])

    @pl.when(k > 0)
    def _():
        cp = pltpu.make_async_copy(
            in_hbm.at[:, pl.ds(start - halo, halo)],
            buf.at[:, pl.ds(0, halo)], sem_h)
        cp.start()
        cp.wait()

    cp = pltpu.make_async_copy(
        in_hbm.at[:, pl.ds(start, block)],
        buf.at[:, pl.ds(halo, block)], sem_b)
    cp.start()
    cp.wait()

    W = block + halo
    # global flat index of each lane
    g = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) + (start - halo)
    local = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    rows = 8 * d
    # in-place halving: each pass folds buf[C:2C] onto buf[0:C]; writes
    # happen after both halves are read, so no aliasing hazard
    for delta, L in ((Gy * Gz, Gx), (Gz, Gy), (1, Gz)):
        rows //= 2
        a = buf[0:rows, :]
        b = buf[rows:2 * rows, :]
        coord = (g // delta) % L
        keep = local >= delta
        valid = coord >= 1
        edge = coord == L - 1
        buf[0:rows, :] = a + _shift_term(b, delta, keep, valid) \
            + jnp.where(edge, b, jnp.zeros((), b.dtype))
    out_ref[:, :] = buf[0:d, halo:]


@functools.partial(jax.jit, static_argnums=(1, 2))
def fold_octa_cotangent_pallas(cot_t: jax.Array, gshape,
                               block: int | None = None) -> jax.Array:
    """(8D, G^3) f32 -> (Gx, Gy, Gz, D): the octa-build adjoint as one
    Pallas pass.  Caller must check :func:`fold_pallas_supported`."""
    Gx, Gy, Gz, D = gshape
    M = Gx * Gy * Gz
    block = block or _BLOCK
    while M % block:
        block //= 2
    halo = Gy * Gz + Gz + 128          # covers the max shift Gy*Gz + Gz + 1
    n_blocks = M // block

    kernel = functools.partial(_fold_kernel, block=block, halo=halo,
                               gshape=gshape, d=D)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((D, block), lambda k: (0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, M), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8 * D, block + halo), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_INTERPRET,
    )(cot_t)
    return jnp.transpose(out, (1, 0)).reshape(Gx, Gy, Gz, D)


def fold_pallas_supported(gshape) -> bool:
    """Lane-alignment gating: every DMA offset must be 128-aligned and the
    halo must fit the block budget."""
    Gx, Gy, Gz, D = gshape
    M = Gx * Gy * Gz
    block = _BLOCK
    while M % block:
        block //= 2
    halo = Gy * Gz + Gz + 128
    vmem_bytes = 8 * D * (block + halo) * 4
    # halo <= block keeps every k>=1 halo DMA start (k*block - halo) >= 0
    return (Gz % 128 == 0 and (Gy * Gz) % 128 == 0 and block >= 128
            and halo <= block and vmem_bytes < 96 * 2 ** 20)
