"""eQTL pair regression under GSPMD auto-sharding: placing the pair batch
on the mesh must give string-identical results to single-device."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from stoat_tpu.io.snarl_file import parse_snarl_path
from stoat_tpu.io.vcf import VcfReader
from stoat_tpu.matrix import EdgeHaplotypeMatrix
from stoat_tpu.parallel import make_snarl_mesh
from stoat_tpu.pipeline.quantitative import (eqtl_design_for_chromosome,
                                             eqtl_regress_pairs)
from stoat_tpu.stats.linreg import linear_regression_batch
from stoat_tpu.tables import pack_chromosome
from stoat_tpu.writer import format_p

from fixtures import make_fixture


def test_eqtl_pairs_gspmd_parity(tmp_path):
    paths = make_fixture(str(tmp_path), n_samples=40, n_snarls=16, seed=19)
    reader = VcfReader(paths["vcf"])
    _, records = next(iter(reader.chromosome_chunks()))
    matrix = EdgeHaplotypeMatrix(80)
    for rec in records:
        matrix.add_record(rec)
    snarls = parse_snarl_path(paths["snarl"])["ref"]
    packed = pack_chromosome(snarls, matrix)

    design = eqtl_design_for_chromosome(packed, None, 3, 5, 0.05)
    rng = np.random.default_rng(0)
    B = 16
    pair_snarl = rng.integers(0, packed.n_snarls, B)
    expr = rng.standard_normal((B, 40))

    base = eqtl_regress_pairs(design, pair_snarl, expr)

    # shard the pair batch over the 8-device mesh and re-run the OLS
    mesh = make_snarl_mesh()
    shard = NamedSharding(mesh, P("snarls"))
    ps = jnp.asarray(pair_snarl)
    X = jax.device_put(design["X"][ps], shard)
    used = jax.device_put(design["used"][ps], shard)
    ncols = jax.device_put(design["ncols"][ps], shard)
    y = jax.device_put(jnp.asarray(expr) * design["used"][ps], shard)
    p, beta, se, r2 = linear_regression_batch(X, y, used, ncols)

    deg = np.asarray(design["degenerate"])[pair_snarl]
    for i in range(B):
        if deg[i]:
            continue
        assert format_p(float(np.asarray(p)[i])) == format_p(base["p"][i])
        assert format_p(float(np.asarray(beta)[i])) == format_p(base["beta"][i])


def test_eqtl_pairs_shard_map_parity(tmp_path):
    """eqtl_regress_pairs_sharded (shard_map over the pair axis) matches
    the single-device pair regression string-for-string."""
    from stoat_tpu.parallel import eqtl_regress_pairs_sharded

    paths = make_fixture(str(tmp_path), n_samples=40, n_snarls=16, seed=23)
    reader = VcfReader(paths["vcf"])
    _, records = next(iter(reader.chromosome_chunks()))
    matrix = EdgeHaplotypeMatrix(80)
    for rec in records:
        matrix.add_record(rec)
    snarls = parse_snarl_path(paths["snarl"])["ref"]
    packed = pack_chromosome(snarls, matrix)

    design = eqtl_design_for_chromosome(packed, None, 3, 5, 0.05)
    rng = np.random.default_rng(1)
    B = 19  # deliberately not a multiple of the device count
    pair_snarl = rng.integers(0, packed.n_snarls, B)
    expr = rng.standard_normal((B, 40))

    base = eqtl_regress_pairs(design, pair_snarl, expr)
    mesh = make_snarl_mesh()
    res = eqtl_regress_pairs_sharded(design, pair_snarl, expr, mesh)

    deg = np.asarray(design["degenerate"])[pair_snarl]
    for i in range(B):
        if deg[i]:
            continue
        for key in ("p", "beta", "se", "r2"):
            assert format_p(res[key][i]) == format_p(base[key][i]), (i, key)
