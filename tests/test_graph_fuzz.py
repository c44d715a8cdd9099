"""Randomized differential testing: native graph pipeline vs Python twin.

The fixture zoo (test_decompose_zoo, test_graph_contract) pins curated
shapes; this file drives RANDOM small graphs — mixed bubble arities,
deletion edges, inversions in sample paths, dangling branches — through
both the native one-call prepare (graph_core.cpp) and the readable
Python pipeline, asserting byte-identical TSV and FASTA output.  Any
divergence in the from-scratch snarl finder / partitioner / walk shows
up here first.
"""

import filecmp
import random

import pytest


def _random_graph(tmp_path, seed):
    rng = random.Random(seed)
    n_bubbles = rng.randint(3, 12)
    n_samples = rng.randint(3, 8)
    gfa = tmp_path / f"fuzz_{seed}.gfa"
    node = 1
    chain = []          # per bubble: (anchor, [mid nodes])
    lines = ["H\tVN:Z:1.0"]
    seqs = "ACGT"
    for _ in range(n_bubbles):
        a = node
        arity = rng.randint(1, 3)       # 1 = possible deletion-vs-seq
        mids = list(range(node + 1, node + 1 + arity))
        lines.append(f"S\t{a}\t{''.join(rng.choice(seqs) for _ in range(rng.randint(1, 5)))}")
        for m in mids:
            lines.append(f"S\t{m}\t{''.join(rng.choice(seqs) for _ in range(rng.randint(1, 4)))}")
        nxt = node + 1 + arity
        for m in mids:
            lines.append(f"L\t{a}\t+\t{m}\t+\t0M")
            lines.append(f"L\t{m}\t+\t{nxt}\t+\t0M")
        if rng.random() < 0.4:          # deletion edge straight across
            lines.append(f"L\t{a}\t+\t{nxt}\t+\t0M")
        chain.append((a, mids))
        node = nxt
    last = node
    lines.append(f"S\t{last}\t{''.join(rng.choice(seqs) for _ in range(3))}")
    if rng.random() < 0.3:              # dangling branch off one anchor
        d = last + 1
        lines.append(f"S\t{d}\tA")
        lines.append(f"L\t{chain[0][0]}\t+\t{d}\t+\t0M")

    def path_line(name, allele_picks, allow_del):
        toks = []
        for (a, mids), pick in zip(chain, allele_picks):
            toks.append(f"{a}+")
            if pick is not None:
                toks.append(f"{mids[pick]}+")
        toks.append(f"{last}+")
        return f"P\t{name}\t" + ",".join(toks) + "\t*"

    ref_picks = [0 if mids else None for _a, mids in chain]
    lines.append(path_line("ref", ref_picks, False))
    samples = [f"s{i}" for i in range(n_samples)]
    for s in samples:
        picks = []
        for a, mids in chain:
            if mids and not (rng.random() < 0.25):
                picks.append(rng.randrange(len(mids)))
            else:
                picks.append(None)      # takes the deletion edge if any
        lines.append(path_line(f"{s}#0#chr", picks, True))
    gfa.write_text("\n".join(lines) + "\n")
    pheno = tmp_path / f"pheno_{seed}.tsv"
    with open(pheno, "w") as fh:
        fh.write("FID\tIID\tPHENO\n")
        for i, s in enumerate(samples):
            fh.write(f"{s}\t{s}\t{1 + i % 2}\n")
    return str(gfa), str(pheno)


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("method,fmt", [("chi2", "tsv"), ("chi2", "fasta"),
                                        ("exact", "tsv")])
def test_native_python_differential(tmp_path, seed, method, fmt,
                                    monkeypatch):
    from stoat_tpu.graph.association import run_graph_association
    from stoat_tpu.native import get_graph_lib

    if get_graph_lib() is None:
        pytest.skip("native graph core unavailable")
    gfa, pheno = _random_graph(tmp_path, seed)
    out_n = tmp_path / f"n_{seed}_{method}_{fmt}"
    out_p = tmp_path / f"p_{seed}_{method}_{fmt}"
    out_n.mkdir()
    out_p.mkdir()
    rc_n = run_graph_association(gfa, "", pheno, method, fmt, 0, "ref",
                                 str(out_n))
    monkeypatch.setenv("STOAT_GRAPH_PYTHON", "1")
    rc_p = run_graph_association(gfa, "", pheno, method, fmt, 0, "ref",
                                 str(out_p))
    monkeypatch.delenv("STOAT_GRAPH_PYTHON")
    assert rc_n == rc_p
    if rc_n != 0:
        return
    name = ("binary_table_graph.tsv" if fmt == "tsv"
            else "binary_output.fasta")
    assert filecmp.cmp(out_n / name, out_p / name, shallow=False), \
        f"divergence at seed={seed} method={method} fmt={fmt}"
