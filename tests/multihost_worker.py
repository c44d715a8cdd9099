"""Worker for the 2-process multi-host SPMD test (run by
test_multihost.py, one instance per emulated host).

Each process owns 4 virtual CPU devices; the 2-process global mesh has 8.
Each host packs only ITS snarl shard (host-sharded input), the global
array is assembled with make_array_from_single_device_arrays, and the
sharded binary pipeline runs; process 0 writes the gathered results.
"""

import os
import sys

process_id = int(sys.argv[1])
coordinator = sys.argv[2]
outdir = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=2, process_id=process_id)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fixtures import make_fixture
from stoat_tpu.io.snarl_file import parse_snarl_path
from stoat_tpu.io.phenotype import parse_binary_pheno
from stoat_tpu.io.vcf import VcfReader
from stoat_tpu.matrix import EdgeHaplotypeMatrix
from stoat_tpu.parallel.mesh import shard_packed_chromosome
from stoat_tpu.pipeline.binary import binary_tables_device

# Deterministic dataset (same on both hosts).  Only process 0 writes the
# shared fixture dir — concurrent writers raced under full-suite load and
# process 1 could read a half-written VCF.  Process 1 renders the same
# deterministic fixture into a private scratch dir (to obtain the paths
# dict) and then points at process 0's files once the sentinel appears.
fixture_dir = os.path.join(outdir, "data")
sentinel = os.path.join(outdir, "fixture_ready")
if process_id == 0:
    paths = make_fixture(fixture_dir, n_samples=30, n_snarls=16, seed=4)
    with open(sentinel, "w") as fh:
        fh.write("ok")
else:
    import time
    scratch = os.path.join(outdir, "data_scratch1")
    paths = make_fixture(scratch, n_samples=30, n_snarls=16, seed=4)
    paths = {k: (os.path.join(fixture_dir, os.path.basename(v))
                 if isinstance(v, str) else v)
             for k, v in paths.items()}
    deadline = time.time() + 180
    while not os.path.exists(sentinel):
        if time.time() > deadline:
            raise RuntimeError("process 0 never finished the fixture")
        time.sleep(0.1)
reader = VcfReader(paths["vcf"])
_, records = next(iter(reader.chromosome_chunks()))
matrix = EdgeHaplotypeMatrix(60)
for rec in records:
    matrix.add_record(rec)
snarls = parse_snarl_path(paths["snarl"])["ref"]
pheno, _ = parse_binary_pheno(paths["binary"], list(paths["samples"]))

devices = np.array(jax.devices())  # 8 global devices across 2 processes
assert devices.shape[0] == 8, devices
mesh = Mesh(devices, ("snarls",))

# one shard per device; each host materialises only its local shards
sharded = shard_packed_chromosome(snarls, matrix, 8)
shard_spec = NamedSharding(mesh, P("snarls"))
repl_spec = NamedSharding(mesh, P())
local_devices = jax.local_devices()


def make_global(arr, sharding, shard_axis):
    if shard_axis is None:
        singles = [jax.device_put(arr, d) for d in local_devices]
        return jax.make_array_from_single_device_arrays(
            arr.shape, sharding, singles)
    singles = []
    for d in local_devices:
        # device d owns global shard index = its position in the mesh
        idx = list(devices).index(d)
        singles.append(jax.device_put(arr[idx:idx + 1], d))
    return jax.make_array_from_single_device_arrays(
        arr.shape, sharding, singles)


pheno_hap = np.repeat(pheno.astype(np.float32), 2)
num_paths = sharded.paths_per_shard

g_matrix = make_global(np.asarray(sharded.matrix, np.float32), repl_spec, None)
g_coo_path = make_global(sharded.coo_path, shard_spec, 0)
g_coo_row = make_global(sharded.coo_row, shard_spec, 0)
g_n_edges = make_global(sharded.n_edges_per_path, shard_spec, 0)
g_valid = make_global(sharded.path_valid, shard_spec, 0)
g_idx = make_global(sharded.snarl_path_idx, shard_spec, 0)
g_pheno = make_global(pheno_hap, repl_spec, None)


def local_fn(matrix_a, coo_path, coo_row, n_edges, valid, idx, pheno_a):
    # tails=False: the igammac chi2 tail compiles pathologically slowly
    # under manual partitioning (same as binary_analyze_sharded); finish
    # it on gathered host arrays after process_allgather below.
    out = binary_tables_device(
        matrix_a, coo_path[0], coo_row[0], n_edges[0], valid[0], idx[0],
        pheno_a, jnp.float64(3), jnp.float64(5), jnp.float64(0.05),
        num_paths=num_paths, tails=False)
    return {k: v[None] for k, v in out.items()}


fn = jax.jit(jax.shard_map(
    local_fn, mesh=mesh,
    in_specs=(P(), P("snarls"), P("snarls"), P("snarls"), P("snarls"),
              P("snarls"), P()),
    out_specs=P("snarls")))

out = fn(g_matrix, g_coo_path, g_coo_row, g_n_edges, g_valid, g_idx, g_pheno)

from jax.experimental import multihost_utils

gathered = {k: np.asarray(multihost_utils.process_allgather(v, tiled=True))
            for k, v in out.items()
            if k in ("chi2_stat", "chi2_df", "chi2_invalid", "chi2_zexp",
                     "p_fisher", "filtered")}

if process_id == 0:
    from stoat_tpu.stats.chi2 import finish_chi2_pvalues
    sizes = sharded.shard_sizes

    def unshard(key):
        arr = gathered[key]
        return np.concatenate([arr[d, :sizes[d]] for d in range(8)])

    p_chi2 = np.asarray(finish_chi2_pvalues(
        jnp.asarray(unshard("chi2_stat")), jnp.asarray(unshard("chi2_df")),
        jnp.asarray(unshard("chi2_invalid")),
        jnp.asarray(unshard("chi2_zexp"))))
    np.savez(os.path.join(outdir, "multihost_result.npz"),
             p_chi2=p_chi2, p_fisher=unshard("p_fisher"))
    print("WROTE_RESULT")

jax.distributed.shutdown()
