"""Directory-level system-test replay on self-generated data.

The reference's system tier runs the binary and compares whole output
directories against committed goldens, keyed by SNARL (SNARL+GENE for
eQTL) and order-insensitive with exact line equality per key
(/root/reference/tests/system/vcf_simu_test.cpp:136-196,
compare_files_utils.cpp:226-252).  Its snapshot is missing the `.pg` +
`merged_output.vcf.gz` inputs, so those exact goldens can't be replayed
— instead this test freezes goldens produced from stoat-tpu's own
seeded simulator (stoat_tpu/simulate.py) and replays the four
committed-golden modes (binary, binary_covar, quantitative,
quantitative_covar — the same four directories the reference commits
under tests/expected_output/vcf/) PLUS eQTL (whose reference golden
directory is missing upstream) through the real CLI every run.

Regenerate after an intentional output change:
    STOAT_REGEN_GOLDEN=1 python -m pytest tests/test_system_replay.py
then review the golden diff like any other contract change.
"""

import os
import shutil

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden_sysdir")
SEED = 20260821
N_SAMPLES = 60
N_SNARLS = 120

MODES = {
    # mode -> (CLI args beyond -s/-v/-o, output filename)
    "binary": (["-b"], "binary_table_vcf.tsv"),
    "binary_covar": (["-b", "-c"], "binary_table_vcf.tsv"),
    "quantitative": (["-q"], "quantitative_table_vcf.tsv"),
    "quantitative_covar": (["-q", "-c"], "quantitative_table_vcf.tsv"),
}


def _keyed_rows(path, key_cols):
    """{key: full line} per data row (order-insensitive comparison form,
    compare_files_utils.cpp:226-252)."""
    rows = {}
    with open(path) as fh:
        header = fh.readline().rstrip("\n")
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            cols = line.split("\t")
            key = tuple(cols[i] for i in key_cols)
            assert key not in rows, f"duplicate key {key} in {path}"
            rows[key] = line
    return header, rows


def assert_dir_matches_golden(out_dir, golden_dir, key_cols=(3,)):
    """Every golden TSV must exist in out_dir with the same header, the
    same key set, and exact line equality per key."""
    golden_files = sorted(f for f in os.listdir(golden_dir)
                          if f.endswith(".tsv"))
    assert golden_files, f"no goldens under {golden_dir}"
    for name in golden_files:
        got_path = os.path.join(out_dir, name)
        assert os.path.exists(got_path), f"missing output {name}"
        gh, grows = _keyed_rows(os.path.join(golden_dir, name), key_cols)
        oh, orows = _keyed_rows(got_path, key_cols)
        assert oh == gh, f"{name}: header changed"
        missing = set(grows) - set(orows)
        extra = set(orows) - set(grows)
        assert not missing and not extra, (
            f"{name}: key sets differ (missing {sorted(missing)[:3]}, "
            f"extra {sorted(extra)[:3]})")
        for key, line in grows.items():
            assert orows[key] == line, (
                f"{name}: row {key} changed:\n  golden: {line}\n"
                f"  got:    {orows[key]}")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from stoat_tpu.simulate import generate_dataset
    tmp = tmp_path_factory.mktemp("sysreplay")
    files = generate_dataset(str(tmp / "data"), n_samples=N_SAMPLES,
                             n_snarls=N_SNARLS, seed=SEED)
    return files, tmp


def test_directory_replay_eqtl(tmp_path):
    """eQTL directory replay (SNARL+GENE keyed) — the reference's system
    suite declares this case but its golden directory is missing
    (vcf_simu_test.cpp eqtl case; tests/expected_output/vcf/ has no
    eqtl dir), so this golden closes a gap the reference itself has."""
    from stoat_tpu.cli import main as cli_main
    from fixtures import make_fixture

    files = make_fixture(str(tmp_path), n_samples=40, n_snarls=60,
                         seed=SEED)
    out = tmp_path / "out_eqtl"
    rc = cli_main(["vcf", "-s", files["snarl"], "-v", files["vcf"],
                   "-e", files["qtl"], "-G", files["gene_position"],
                   "-o", str(out)])
    assert rc == 0
    golden = os.path.join(GOLDEN_DIR, "eqtl")
    if os.environ.get("STOAT_REGEN_GOLDEN") == "1":
        os.makedirs(golden, exist_ok=True)
        shutil.copy(out / "eqtl_table_vcf.tsv",
                    os.path.join(golden, "eqtl_table_vcf.tsv"))
        pytest.skip("golden regenerated")
    # key = (SNARL, GENE) per compare_files_utils.cpp:27-59
    assert_dir_matches_golden(str(out), golden, key_cols=(3, 5))


@pytest.mark.parametrize("mode", sorted(MODES))
def test_directory_replay(dataset, mode):
    from stoat_tpu.cli import main as cli_main

    files, tmp = dataset
    flags, out_name = MODES[mode]
    out = tmp / f"out_{mode}"
    args = ["vcf", "-s", files["snarl"], "-v", files["vcf"],
            "-o", str(out)]
    for f in flags:
        args += [f, {"-b": files["binary"], "-q": files["quantitative"],
                     "-c": files["covariate"]}[f]]
        if f == "-c":
            args += ["--covar-name", "PC1,PC2"]
    rc = cli_main(args)
    assert rc == 0
    got = out / out_name
    assert got.exists()

    golden = os.path.join(GOLDEN_DIR, mode)
    if os.environ.get("STOAT_REGEN_GOLDEN") == "1":
        os.makedirs(golden, exist_ok=True)
        shutil.copy(got, os.path.join(golden, out_name))
        pytest.skip("golden regenerated")
    assert_dir_matches_golden(str(out), golden)


def test_goldens_are_nontrivial():
    """The frozen goldens must carry real tested rows (not header-only
    files a silent regression could trivially match)."""
    if os.environ.get("STOAT_REGEN_GOLDEN") == "1":
        pytest.skip("regenerating")
    for mode, (_f, out_name) in MODES.items():
        path = os.path.join(GOLDEN_DIR, mode, out_name)
        with open(path) as fh:
            lines = fh.readlines()
        assert len(lines) > 50, f"{mode} golden suspiciously small"
        # at least half the rows carry a real (non-NA) p-value
        pcol = 6 if mode.startswith("binary") and "covar" not in mode \
            else 5
        real = sum(1 for ln in lines[1:]
                   if ln.split("\t")[pcol] not in ("NA", ""))
        assert real > (len(lines) - 1) // 2, f"{mode}: mostly NA"
