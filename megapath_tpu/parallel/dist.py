"""Multi-chip sharding: index shards x read batches over a device mesh.

The reference processes NT index shards *sequentially*, carrying hits
in FASTQ comments (runMegaPath.sh:191-227, SURVEY.md §2.7 item 6). The
TPU design runs all shards *concurrently*: the packed reference text is
sharded over the mesh's 'shard' axis, read batches are data-parallel
over 'data', per-read best hits merge with a pmax over 'shard' (the
associative merge the comment chain implements sequentially), and
per-taxon counts reduce with psum over 'data'.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from megapath_tpu.align.device import gather_windows
from megapath_tpu.ops.dp import DPParams, sw_align


def make_mesh(
    n_devices: int | None = None, shard_axis: int | None = None
) -> Mesh:
    """(data, shard) mesh. shard_axis defaults to min(2, n) so small
    device counts still exercise both axes."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if shard_axis is None:
        shard_axis = 2 if n % 2 == 0 and n >= 2 else 1
    data_axis = n // shard_axis
    arr = np.array(devs).reshape(data_axis, shard_axis)
    return Mesh(arr, axis_names=("data", "shard"))


class DistAlignOut(NamedTuple):
    best_score: jnp.ndarray  # int32 [B] best over all shards
    best_shard: jnp.ndarray  # int32 [B] shard of the best hit
    best_pos: jnp.ndarray  # int32 [B] window start of the best hit
    taxon_counts: jnp.ndarray  # int32 [T] global per-taxon read counts


def build_dist_align_step(
    mesh: Mesh,
    width: int,
    n_taxa: int,
    params: DPParams = DPParams(),
    cutoff_lb: int = 30,
    cutoff_ratio: float = 0.2,
):
    """The full multi-chip step, jitted over the mesh.

    Inputs (global shapes):
      ref_shards   [S, N]   uint8 packed text, sharded over 'shard'
      seq_taxon    [S, T_max] int32 per-shard window->taxon map (toy:
                   taxon of a window start bucket), sharded over 'shard'
      reads        [B, L]   uint8, sharded over 'data'
      read_lens    [B]      int32, sharded over 'data'
      cand_pos     [B, S]   int32 per-shard candidate window start,
                   sharded over 'data' (replicated over 'shard')
    """
    n_shards = mesh.shape["shard"]

    def local_step(ref_local, reads, read_lens, cand_pos):
        # ref_local: [1, N]; cand_pos: [Blocal, S]
        shard_id = jax.lax.axis_index("shard")
        ref = ref_local[0]
        pos = jnp.take_along_axis(
            cand_pos, jnp.full((cand_pos.shape[0], 1), shard_id, dtype=jnp.int32), axis=1
        )[:, 0]
        wins = gather_windows(ref, pos, width)
        wlens = jnp.full(reads.shape[0], width, dtype=jnp.int32)
        res = sw_align(reads, wins, read_lens, wlens, params=params)
        thr = jnp.maximum(
            (cutoff_ratio * read_lens).astype(jnp.int32), jnp.int32(cutoff_lb)
        )
        score = jnp.where(res.score >= thr, res.score, 0)

        # merge across index shards: per-read best score, then argmax
        # (shard, pos) via masked pmaxes — ties resolve to the highest
        # shard id deterministically
        best_score = jax.lax.pmax(score, "shard")
        is_best = score == best_score
        best_shard = jax.lax.pmax(
            jnp.where(is_best, shard_id, -1).astype(jnp.int32), "shard"
        )
        best_pos = jax.lax.pmax(
            jnp.where(is_best & (shard_id == best_shard), pos.astype(jnp.int32), -1),
            "shard",
        )

        # classification reduction: winning shard owns the taxon; count
        # reads per taxon and reduce over the whole mesh
        owns = best_shard == shard_id
        taxon = jnp.where(
            owns & (best_score > 0), best_pos % n_taxa, n_taxa  # toy map
        )
        hist = jnp.zeros(n_taxa + 1, dtype=jnp.int32).at[taxon].add(1)
        hist = jax.lax.psum(hist, "data")
        hist = jax.lax.psum(hist, "shard")
        return best_score, best_shard, best_pos, hist[:n_taxa]

    shmapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P("shard", None),
            P("data", None),
            P("data"),
            P("data", None),
        ),
        out_specs=(P("data"), P("data"), P("data"), P(None)),
        check_vma=False,  # scan carries start unvarying inside the map
    )
    return jax.jit(shmapped)


def shard_arrays(mesh: Mesh, **arrays):
    """Place arrays with their canonical shardings."""
    spec = {
        "ref_shards": P("shard", None),
        "seq_taxon": P("shard", None),
        "reads": P("data", None),
        "read_lens": P("data"),
        "cand_pos": P("data", None),
    }
    out = {}
    for k, v in arrays.items():
        out[k] = jax.device_put(v, NamedSharding(mesh, spec[k]))
    return out
