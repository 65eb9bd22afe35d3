"""Pallas segmented reduction over gid-sorted gradient rows.

The backward of the Pallas compositor routes per-pair gradient rows back to
per-Gaussian gradients. After the 11-operand sort groups rows by Gaussian id,
the remaining work is a segment sum: d_attrs[g] = sum of the (contiguous) rows
whose id is g. Round 2 did this with a (P, 10) cumsum (19 ms) + a P-sized
boundary scatter + cummax forward-fill + gathers (26 ms) at 1080p/1M — 45 ms
of pure XLA glue (docs/PERF_NOTES.md round-2 stage budget).

This kernel replaces all of it with ONE pass over the sorted rows:

  * The Gaussian-id space is cut into blocks of G=256 consecutive ids; grid =
    one step per block, whose (16, G) output tile is a standard BlockSpec
    write (static offsets — the whole reason to iterate over ID space, not
    row space: TPU has no scatter worth using).
  * Each block's rows live in a CONTIGUOUS, known window of the sorted array.
    The window is found without searchsorted (1k+ binary-search queries cost
    milliseconds in chained gathers): because rows are sorted, the first id of
    every 512-row chunk (a free strided slice) brackets every block's chunk
    range with two broadcast compare+sums — O(C*NB) elementwise, ~0.3 ms at 5M.
  * Within a chunk, rows are routed to their output row by a ONE-HOT MATMUL:
    payload (16, 512) x onehot(gid - block_base) (G, 512), contracted over the
    512 rows and accumulated in f32 — the MXU is the only TPU unit that can
    "scatter" 512 rows into 256 slots in one shot. Ids ride as exact f32 in
    the last payload sublane (asserted < 2^24 upstream).
  * Rows outside the block's id range (chunk-boundary slop, padding, the
    masked garbage-id-zero-payload rows the backward kernel emits) one-hot to
    all-zero columns — no explicit masking is ever needed.

Layouts follow the patterns proven on this backend in rounds 1-2: the input
is chunk-major (C, 16, 512) blocks sliced on dim 0 (narrow (P, 16) rows are
NOT HBM-sliceable — lane dims must be 128-aligned), and the output keeps ids
on the 128-multiple lane dimension, (NB, 16, G), untransposed on the host.

Accumulation order inside a segment matches ascending row order per chunk and
chunk-major across chunks; each partial sum is an exact-f32 matmul accumulate,
which is numerically no worse than the cumsum difference scheme it replaces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG_G = 256        # Gaussian ids per grid step (output tile lanes)
SEG_R = 512        # rows per DMA chunk (lane dim of the stacked blocks)
NROWS = 16         # stacked sublanes: payload channels + id row + padding
PAD_ID = 1 << 25   # exact in f32, beyond any real id (< 2^24 asserted)


def _seg_kernel(g_block: int, c_start_ref, n_chunks_ref, stacked_hbm, out_ref,
                scratch, sems):
    b = pl.program_id(0)
    cs = c_start_ref[b]
    nc = n_chunks_ref[b]
    base = (b * g_block).astype(jnp.float32)

    def dma(slot, k):
        return pltpu.make_async_copy(
            stacked_hbm.at[cs + k], scratch.at[slot], sems.at[slot])

    @pl.when(nc > 0)
    def _prefetch():
        dma(0, 0).start()

    jrow = (jax.lax.broadcasted_iota(jnp.int32, (g_block, 1), 0)
            .astype(jnp.float32) + base)

    def body(k, acc):
        @pl.when(k + 1 < nc)
        def _next():
            dma((k + 1) % 2, k + 1).start()

        dma(k % 2, k).wait()
        blk = scratch[k % 2]                       # (NROWS, SEG_R)
        gid_row = blk[NROWS - 1:NROWS, :]          # (1, SEG_R) f32 ids
        onehot = (gid_row == jrow).astype(jnp.float32)   # (G, SEG_R)
        # (NROWS, SEG_R) x (G, SEG_R) contracted over rows -> (NROWS, G).
        # precision=HIGHEST: the MXU's DEFAULT f32 "matmul" truncates inputs
        # to bf16 (one pass) — that rounding (2^-8 ~= 3.9e-3 relative) was
        # the round-3 gradient-parity drift (max_rel ~6e-5 -> ~4e-3, VERDICT
        # r3 weak #4 / next #5). The one-hot operand is exact either way;
        # HIGHEST runs the multi-pass f32 algorithm so the payload operand is
        # exact too. The kernel is DMA/overhead-bound per 512-row chunk
        # (32 KB DMA vs a 16x512x256 matmul), so the extra passes are cheap.
        part = jax.lax.dot_general(
            blk, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return acc + part

    acc = jax.lax.fori_loop(
        0, nc, body, jnp.zeros((NROWS, g_block), jnp.float32))
    out_ref[0] = acc


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=32)
def _get_seg_call(nb: int, n_chunks_total: int, g_block: int, interpret: bool):
    kernel = functools.partial(_seg_kernel, g_block)

    def call(stacked, c_start, n_chunks):
        grid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, NROWS, g_block),
                                   lambda b, s, c: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, NROWS, SEG_R), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid,
            out_shape=jax.ShapeDtypeStruct((nb, NROWS, g_block), jnp.float32),
            interpret=interpret,
        )(c_start, n_chunks, stacked)

    return call


def segment_reduce_sorted(gid_sorted: jnp.ndarray, payload: tuple,
                          n_out: int, g_block: int = SEG_G) -> jnp.ndarray:
    """Segment-sum ``payload`` rows (grouped by ascending ``gid_sorted``) into
    ``(n_out, len(payload))``. Ids outside [0, n_out) (garbage rows with zero
    payload, padding) contribute nothing to in-range outputs by construction;
    they fall in blocks past n_out or match no one-hot column.

    gid_sorted: (P,) int32, ascending. payload: tuple of (P,) f32 arrays
    (at most NROWS - 1). Everything is jittable with static shapes.
    """
    assert len(payload) <= NROWS - 1
    p = gid_sorted.shape[0]
    p_pad = -(-p // SEG_R) * SEG_R
    nb = -(-n_out // g_block)

    gid_pad = jnp.concatenate(
        [gid_sorted, jnp.full((p_pad - p,), PAD_ID, jnp.int32)])
    c = p_pad // SEG_R
    rows = [jnp.concatenate([v, jnp.zeros((p_pad - p,), v.dtype)])
            for v in payload]
    zero = jnp.zeros((p_pad,), jnp.float32)
    stacked = jnp.stack(
        [r.reshape(c, SEG_R) for r in rows]
        + [zero.reshape(c, SEG_R)] * (NROWS - 1 - len(rows))
        + [gid_pad.astype(jnp.float32).reshape(c, SEG_R)],
        axis=1)                                            # (C, NROWS, SEG_R)

    # Chunk-range brackets from the sorted chunk heads (strided slice, free):
    # chunk c is ENTIRELY BEFORE block b when its successor's head id is
    # already below the block base (last_gid(c) <= head(c+1)); it CAN contain
    # block-b rows only while its own head id is below the block end.
    heads = gid_pad[::SEG_R]                               # (C,)
    heads_next = jnp.concatenate(
        [heads[1:], jnp.array([PAD_ID], jnp.int32)])
    b_lo = (jnp.arange(nb, dtype=jnp.int32) * g_block)[:, None]   # (NB, 1)
    c_start = jnp.sum((heads_next[None, :] < b_lo).astype(jnp.int32), axis=1)
    c_end = jnp.sum((heads[None, :] < b_lo + g_block).astype(jnp.int32),
                    axis=1)
    n_chunks = c_end - c_start

    call = _get_seg_call(nb, c, g_block, _use_interpret())
    out = call(stacked, c_start.astype(jnp.int32), n_chunks.astype(jnp.int32))
    # (NB, NROWS, G) -> (NROWS, NB*G) -> (n_out, len(payload))
    flat = out.transpose(1, 0, 2).reshape(NROWS, nb * g_block)
    return flat[:len(payload), :n_out].T
