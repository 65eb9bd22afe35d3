"""Unit tests for the Pallas sorted segment reduction (ops/segreduce.py).

Runs in interpret mode on CPU (conftest forces jax_platforms=cpu). The oracle
is jax.ops.segment_sum over the same rows. Covers empty segments, all-one-id,
block-boundary ids, garbage ids with zero payload (the backward kernel's
masked rows), and n_out not a multiple of the block size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sage3d_tpu.ops.segreduce import SEG_G, SEG_R, segment_reduce_sorted


def _oracle(gids, payload, n_out):
    cols = [jax.ops.segment_sum(v, gids, num_segments=n_out,
                                indices_are_sorted=True) for v in payload]
    return jnp.stack(cols, axis=1)


def _run(gids, payload, n_out):
    gids = jnp.asarray(np.sort(np.asarray(gids)), jnp.int32)
    payload = tuple(jnp.asarray(v, jnp.float32) for v in payload)
    got = segment_reduce_sorted(gids, payload, n_out)
    want = _oracle(gids, payload, n_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    return got


@pytest.mark.parametrize("n_out,p", [
    (100, 1000),            # dense tiny
    (SEG_G * 3 + 17, 4096), # n_out not a multiple of the block size
    (2000, SEG_R * 4),      # rows exactly chunk-aligned
    (50, 37),               # p smaller than one chunk
])
def test_matches_segment_sum(n_out, p):
    rng = np.random.default_rng(n_out + p)
    gids = rng.integers(0, n_out, p)
    payload = tuple(rng.normal(size=p).astype(np.float32) for _ in range(10))
    _run(gids, payload, n_out)


def test_empty_segments_and_all_same():
    rng = np.random.default_rng(0)
    p = 1500
    # every row the same id -> one huge segment, everything else empty
    gids = np.full(p, 777)
    payload = (rng.normal(size=p).astype(np.float32),)
    out = _run(gids, payload, 2000)
    assert float(jnp.sum(jnp.abs(out))) == pytest.approx(
        float(jnp.abs(jnp.sum(jnp.asarray(payload[0])))), rel=1e-5)


def test_block_boundary_ids():
    # ids exactly at multiples of SEG_G exercise the bracket math
    ids = []
    for b in range(5):
        ids += [b * SEG_G - 1, b * SEG_G, b * SEG_G + 1]
    ids = np.array([i for i in ids if i >= 0])
    payload = (np.ones(len(ids), np.float32),)
    _run(ids, payload, 5 * SEG_G)


def test_garbage_ids_with_zero_payload_are_harmless():
    # the backward kernel emits masked rows with in-range ids but ZERO
    # payload; they must not perturb any output
    rng = np.random.default_rng(3)
    p = 2048
    gids = np.sort(rng.integers(0, 300, p))
    payload = [rng.normal(size=p).astype(np.float32) for _ in range(3)]
    base = _run(gids, tuple(payload), 300)
    extra_ids = np.sort(np.concatenate([gids, rng.integers(0, 300, 512)]))
    # rebuild payloads with zeros at the positions of the inserted ids
    mask = np.zeros(len(extra_ids), bool)
    # mark 512 inserted positions: do it by multiset difference walk
    from collections import Counter
    want = Counter(gids)
    keep_rows = []
    for i, g in enumerate(extra_ids):
        if want[g] > 0:
            want[g] -= 1
            keep_rows.append(i)
    mask[keep_rows] = True
    payload2 = []
    for v in payload:
        # base pairs sorted-gid j with payload row j; the kept rows appear in
        # the same sorted order, so row j of v lands at the j-th kept slot
        w = np.zeros(len(extra_ids), np.float32)
        w[mask] = v
        payload2.append(w)
    got = segment_reduce_sorted(jnp.asarray(extra_ids, jnp.int32),
                                tuple(jnp.asarray(v) for v in payload2), 300)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_large_random_many_payloads():
    rng = np.random.default_rng(9)
    p = SEG_R * 23 + 311
    n_out = 3 * SEG_G + 5
    gids = rng.integers(0, n_out, p)
    payload = tuple(rng.normal(size=p).astype(np.float32) for _ in range(10))
    _run(gids, payload, n_out)
