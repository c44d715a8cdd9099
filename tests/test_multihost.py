"""True multi-process SPMD test: 2 emulated hosts × 4 virtual devices.

Spawns two coordinator-connected JAX processes (jax.distributed), runs the
snarl-sharded binary pipeline over the global 8-device mesh with
host-local input shards, and checks the gathered p-values match the
single-process result — the "≥2 hosts, value parity" contract from
BASELINE.md, exercised for real rather than asserted.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_value_parity(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), coordinator, str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outputs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i}:\n{outputs[i][-3000:]}"
    assert "WROTE_RESULT" in outputs[0] or "WROTE_RESULT" in outputs[1]

    result = np.load(tmp_path / "multihost_result.npz")

    # single-process reference on the same dataset
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_fixture  # noqa: F401 (fixture already built)
    from stoat_tpu.io.snarl_file import parse_snarl_path
    from stoat_tpu.io.phenotype import parse_binary_pheno
    from stoat_tpu.io.vcf import VcfReader
    from stoat_tpu.matrix import EdgeHaplotypeMatrix
    from stoat_tpu.pipeline.binary import binary_analyze_chromosome
    from stoat_tpu.tables import pack_chromosome
    from stoat_tpu.writer import format_p

    data = str(tmp_path / "data")
    paths = {
        "vcf": os.path.join(data, "test.vcf"),
        "snarl": os.path.join(data, "snarl_analyse.tsv"),
        "binary": os.path.join(data, "binary.pheno.tsv"),
    }
    reader = VcfReader(paths["vcf"])
    samples = reader.samples
    _, records = next(iter(reader.chromosome_chunks()))
    matrix = EdgeHaplotypeMatrix(2 * len(samples))
    for rec in records:
        matrix.add_record(rec)
    snarls = parse_snarl_path(paths["snarl"])["ref"]
    pheno, _ = parse_binary_pheno(paths["binary"], list(samples))
    packed = pack_chromosome(snarls, matrix)
    base = binary_analyze_chromosome(packed, pheno, 3, 5, 0.05)

    S = packed.n_snarls
    assert result["p_chi2"].shape[0] == S
    for i in range(S):
        assert format_p(result["p_chi2"][i]) == format_p(base["p_chi2"][i])
        assert format_p(result["p_fisher"][i]) == \
            format_p(base["p_fisher"][i])
