"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_graft_entry_single():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    assert out.score.shape == (256,)
    assert int(np.asarray(out.passed).sum()) >= 128  # planted matches pass


@pytest.mark.parametrize("n", [2, 4, 8])
def test_dryrun_multichip(n):
    import __graft_entry__ as g

    g.dryrun_multichip(n)


def test_dist_merge_correctness():
    """Cross-shard pmax merge picks the true best shard per read."""
    from megapath_tpu.parallel.dist import (
        build_dist_align_step,
        make_mesh,
        shard_arrays,
    )

    mesh = make_mesh(8)
    S = mesh.shape["shard"]
    D = mesh.shape["data"]
    rng = np.random.default_rng(3)
    N, B, L, W = 2048, 4 * D, 64, 128
    ref_shards = rng.integers(0, 4, (S, N)).astype(np.uint8)
    reads = rng.integers(0, 4, (B, L)).astype(np.uint8)
    cand_pos = rng.integers(0, N - W, (B, S)).astype(np.int32)
    home = np.zeros(B, dtype=np.int32)
    for b in range(B):
        s = (b * 7) % S
        home[b] = s
        p = int(rng.integers(16, N - L - 16))
        reads[b] = ref_shards[s, p : p + L]
        cand_pos[b, s] = p - 8
    lens = np.full(B, L, dtype=np.int32)

    step = build_dist_align_step(mesh, width=W, n_taxa=11)
    placed = shard_arrays(
        mesh, ref_shards=ref_shards, reads=reads, read_lens=lens, cand_pos=cand_pos
    )
    bs, bsh, bp, counts = step(
        placed["ref_shards"], placed["reads"], placed["read_lens"], placed["cand_pos"]
    )
    np.testing.assert_array_equal(np.asarray(bs), np.full(B, L))
    np.testing.assert_array_equal(np.asarray(bsh), home)
    assert int(np.asarray(counts).sum()) == B
