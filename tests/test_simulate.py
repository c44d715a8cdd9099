"""Simulation + truth-verification tests: the GWAS detects injected
associations with good precision/recall (the reference's verify_truth.py
cross-validation role)."""

import json
import os

import pytest

from stoat_tpu.cli import main as cli_main
from stoat_tpu.simulate import generate_dataset, verify_truth


def test_simulate_and_recover_associations(tmp_path):
    out = str(tmp_path / "sim")
    files = generate_dataset(out, n_samples=150, n_snarls=60, seed=3,
                             effect_fraction=0.25, effect_shift=0.4)
    run_dir = str(tmp_path / "run")
    rc = cli_main(["vcf", "-s", files["snarl"], "-v", files["vcf"],
                   "-b", files["binary"], "-o", run_dir])
    assert rc == 0
    results = os.path.join(run_dir, "binary_table_vcf.tsv")
    metrics = verify_truth(results, files["truth"], p_threshold=1e-3,
                           freq_threshold=0.15)
    # injected effects are strong: expect good discrimination
    assert metrics["tp"] >= 3
    assert metrics["precision"] >= 0.7, metrics
    assert metrics["recall"] >= 0.5, metrics


def test_simulate_cli_and_truth_cli(tmp_path, capsys):
    out = str(tmp_path / "sim2")
    rc = cli_main(["simulate", "-o", out, "-n", "60", "-s", "20",
                   "--seed", "5"])
    assert rc == 0
    captured = capsys.readouterr().out
    files = dict(line.split("\t") for line in captured.strip().splitlines())
    assert os.path.exists(files["vcf"])
    assert os.path.exists(files["truth"])

    run_dir = str(tmp_path / "run2")
    rc = cli_main(["vcf", "-s", files["snarl"], "-v", files["vcf"],
                   "-q", files["quantitative"], "-o", run_dir])
    assert rc == 0
    rc = cli_main(["truth", "-r",
                   os.path.join(run_dir, "quantitative_table_vcf.tsv"),
                   "-f", files["truth"]])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(metrics) >= {"precision", "recall", "f1"}
