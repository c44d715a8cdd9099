"""Sharded analysis dispatch via shard_map over the snarl mesh.

Each device runs the identical batched per-snarl program on its shard;
the matrix/phenotype are replicated, results gather back to host.  Value
parity across mesh shapes is pinned by tests (the reference's multi-thread
nondeterminism does not apply: output order is deterministic here).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

from stoat_tpu import jaxconfig  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stoat_tpu.pipeline.binary import binary_tables_device
from stoat_tpu.parallel.mesh import ShardedChromosome

__all__ = ["binary_analyze_sharded"]


def binary_analyze_sharded(sharded: ShardedChromosome,
                           binary_phenotype: np.ndarray,
                           mesh: Mesh,
                           min_individuals: int, min_haplotypes: int,
                           maf_threshold: float) -> Dict[str, np.ndarray]:
    """Run the binary pipeline with snarls sharded over ``mesh``.

    Equivalent results to the single-device path; the leading shard axis of
    every input lives on a different device.
    """
    pheno_hap = np.repeat(binary_phenotype.astype(np.float32), 2)
    num_paths = sharded.paths_per_shard

    shard = NamedSharding(mesh, P("snarls"))
    repl = NamedSharding(mesh, P())

    def local_fn(matrix, coo_path, coo_row, n_edges, valid, idx, pheno,
                 min_ind, min_hap, maf):
        # each arg's leading shard axis is 1 inside the shard body
        out = binary_tables_device(
            matrix, coo_path[0], coo_row[0], n_edges[0], valid[0], idx[0],
            pheno, min_ind, min_hap, maf, num_paths=num_paths)
        return {k: v[None] for k, v in out.items()}

    fn = jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P("snarls"), P("snarls"), P("snarls"), P("snarls"),
                  P("snarls"), P(), P(), P(), P()),
        out_specs=P("snarls"),
    ))

    out = fn(
        jax.device_put(jnp.asarray(sharded.matrix, jnp.float32), repl),
        jax.device_put(jnp.asarray(sharded.coo_path), shard),
        jax.device_put(jnp.asarray(sharded.coo_row), shard),
        jax.device_put(jnp.asarray(sharded.n_edges_per_path), shard),
        jax.device_put(jnp.asarray(sharded.path_valid), shard),
        jax.device_put(jnp.asarray(sharded.snarl_path_idx), shard),
        jax.device_put(jnp.asarray(pheno_hap), repl),
        jnp.float64(min_individuals),
        jnp.float64(min_haplotypes),
        jnp.float64(maf_threshold),
    )

    # Flatten [D, S_local, ...] back to the global snarl order, dropping
    # per-shard padding.
    result: Dict[str, np.ndarray] = {}
    sizes = sharded.shard_sizes
    for key, value in out.items():
        arr = np.asarray(value)
        parts = [arr[d, :sizes[d]] for d in range(len(sizes))]
        result[key] = np.concatenate(parts, axis=0)
    return result
