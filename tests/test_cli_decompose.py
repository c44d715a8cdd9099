"""CLI Case-2/Case-3 tests: decomposition from a GFA through `stoat vcf`.

Case 3 (vcf.cpp:241-244): graph + dist only -> snarl_analyse.tsv.
Case 2: graph + dist + VCF + phenotype -> decomposition + GWAS in one run.
"""

import os

import numpy as np

from stoat_tpu.cli import main as cli_main


def build_fixture(tmp_path, n_samples=20, seed=5):
    """A 3-bubble chain GFA + matching VCF with AT fields + phenotype."""
    rng = np.random.default_rng(seed)
    gfa = tmp_path / "graph.gfa"
    # chain: 1 -(2|3)- 4 -(5|6)- 7 -(8|9)- 10
    lines = ["H\tVN:Z:1.0"]
    seqs = {1: "AAAA", 2: "C", 3: "G", 4: "TTTT", 5: "AC", 6: "T",
            7: "GGGG", 8: "A", 9: "T", 10: "CCCC"}
    for nid, seq in seqs.items():
        lines.append(f"S\t{nid}\t{seq}")
    for a, b in [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (4, 6), (5, 7),
                 (6, 7), (7, 8), (7, 9), (8, 10), (9, 10)]:
        lines.append(f"L\t{a}\t+\t{b}\t+\t0M")
    lines.append("P\tref\t1+,2+,4+,5+,7+,8+,10+\t*")
    gfa.write_text("\n".join(lines) + "\n")

    dist = tmp_path / "graph.dist"
    dist.write_text("placeholder\n")

    samples = [f"s{i}" for i in range(n_samples)]
    snarl_paths = [
        (">1>2>4", ">1>3>4"),
        (">4>5>7", ">4>6>7"),
        (">7>8>10", ">7>9>10"),
    ]
    positions = [1, 9, 19]
    vcf = tmp_path / "test.vcf"
    rows = []
    for (p0, p1), pos in zip(snarl_paths, positions):
        gts = [f"{rng.integers(0,2)}/{rng.integers(0,2)}"
               for _ in samples]
        rows.append("\t".join(
            ["ref", str(pos), ".", "A", "T", "60", "PASS",
             f"AT={p0},{p1}", "GT"] + gts))
    vcf.write_text(
        "##fileformat=VCFv4.2\n##contig=<ID=ref>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(samples) + "\n" + "\n".join(rows) + "\n")

    pheno = tmp_path / "pheno.tsv"
    with open(pheno, "w") as fh:
        fh.write("FID\tIID\tPHENO\n")
        for s in samples:
            fh.write(f"{s}\t{s}\t{rng.integers(1,3)}\n")
    return str(gfa), str(dist), str(vcf), str(pheno)


def test_case3_decomposition_only(tmp_path):
    gfa, dist, _vcf, _pheno = build_fixture(tmp_path)
    out = str(tmp_path / "out3")
    rc = cli_main(["vcf", "-p", gfa, "-d", dist, "-o", out])
    assert rc == 0
    with open(os.path.join(out, "snarl_analyse.tsv")) as fh:
        header = fh.readline().rstrip("\n").split("\t")
        rows = [line.rstrip("\n").split("\t") for line in fh
                if line.strip()]
    assert header == ["CHR", "START_POS", "END_POS", "SNARL_HANDLEGRAPH",
                      "SNARL", "PATHS", "TYPE", "REF", "DEPTH"]
    ids = [r[4] for r in rows]
    assert ids == ["1_4", "4_7", "7_10"]
    # snarl 1_4: start after node 1 (len 4), end at node 4's offset+1-1 = 5
    r = rows[0]
    assert r[0] == "ref" and r[1] == "4" and r[2] == "5"
    assert sorted(r[5].split(",")) == [">1>2>4", ">1>3>4"]
    # round-trip: the emitted file reloads
    from stoat_tpu.io.snarl_file import parse_snarl_path
    loaded = parse_snarl_path(os.path.join(out, "snarl_analyse.tsv"))
    assert len(loaded["ref"]) == 3


def test_case2_decompose_plus_gwas(tmp_path):
    gfa, dist, vcf, pheno = build_fixture(tmp_path)
    out = str(tmp_path / "out2")
    rc = cli_main(["vcf", "-p", gfa, "-d", dist, "-v", vcf, "-b", pheno,
                   "-o", out, "-I", "2", "-H", "2", "-M", "0.0"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "snarl_analyse.tsv"))
    with open(os.path.join(out, "binary_table_vcf.tsv")) as fh:
        fh.readline()
        rows = [line.rstrip("\n").split("\t") for line in fh
                if line.strip()]
    # all 3 snarls testable (lenient thresholds)
    assert {r[3] for r in rows} == {"1_4", "4_7", "7_10"}
    for r in rows:
        assert r[5] != "" and r[6] != ""


def test_dist_flag_warns_loudly(tmp_path, caplog):
    """-d is interface parity only: every run that passes a .dist file
    must log a warning that the file is not read (round-4 verdict item
    6 — silent-ignore reads as a bug to real stoat users)."""
    import logging

    from stoat_tpu.graph.decompose import decompose_to_snarl_file

    gfa = tmp_path / "g.gfa"
    gfa.write_text(
        "H\tVN:Z:1.0\nS\t1\tA\nS\t2\tC\nS\t3\tG\nS\t4\tT\n"
        "L\t1\t+\t2\t+\t0M\nL\t1\t+\t3\t+\t0M\n"
        "L\t2\t+\t4\t+\t0M\nL\t3\t+\t4\t+\t0M\n"
        "P\tref\t1+,2+,4+\t*\n")
    dist = tmp_path / "g.dist"
    dist.write_text("not really a dist index")
    with caplog.at_level(logging.WARNING, logger="stoat"):
        decompose_to_snarl_file(str(gfa), str(dist), str(tmp_path),
                                {"ref"})
    assert any("NOT read" in r.message for r in caplog.records)
