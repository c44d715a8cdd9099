"""Permutation testing (beyond the reference): accounting + semantics.

The chi²/OLS statistic kernels are oracle-pinned elsewhere
(test_stats_oracle, test_golden_replay); these tests pin the
permutation machinery: one deterministic rng protocol, min-P
empirical/FWER counting against an independent numpy recount,
association detection, and the p_emp ≤ p_fwer ordering.
"""

import numpy as np
import pytest

from stoat_tpu.io.phenotype import parse_binary_pheno
from stoat_tpu.io.snarl_file import parse_snarl_path

from fixtures import make_fixture

N_PERMS = 40
SEED = 7


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("perm")
    paths = make_fixture(str(tmp), n_samples=40, n_snarls=30, seed=13,
                         n_chroms=2)
    snarls_chr = parse_snarl_path(paths["snarl"])
    pheno, samples = parse_binary_pheno(paths["binary"],
                                        list(paths["samples"]))
    return paths, snarls_chr, pheno, samples, tmp


def test_masks_deterministic_and_preserve_counts(data):
    from stoat_tpu.pipeline import packed as pk
    from stoat_tpu.pipeline.permutation import (permutation_indices,
                                                permutation_masks)

    _p, _s, pheno, _sm, _t = data
    W = (2 * len(pheno) + 31) // 32
    m1 = permutation_masks(pheno, 8, 3, W)
    m2 = permutation_masks(pheno, 8, 3, W)
    np.testing.assert_array_equal(m1, m2)
    # masks derive from permutation_indices (ONE rng protocol)
    idx = permutation_indices(len(pheno), 8, 3)
    m3 = permutation_masks(pheno, 8, 3, W, perm_idx=idx)
    np.testing.assert_array_equal(m1, m3)
    # every permutation keeps the case count (popcount invariant)
    want = 2 * int(np.sum(pheno))
    tail = pk.tail_mask_words(2 * len(pheno), W)
    for row in m1:
        bits = np.unpackbits((row & tail).view(np.uint8),
                             bitorder="little")
        assert int(bits.sum()) == want


def test_counting_matches_numpy_recount(data):
    """run_permutation_test's P_EMP/P_FWER must equal a direct numpy
    min-P recount over the same (obs, perm) p-values."""
    from stoat_tpu.pipeline.permutation import (binary_permutation_stats,
                                                permutation_masks,
                                                run_permutation_test)
    from stoat_tpu.pipeline.runner import iter_chromosome_matrices
    from stoat_tpu.tables import pack_chromosome_chunks
    from stoat_tpu.formatting import set_precision

    paths, snarls_chr, pheno, samples, tmp = data
    out = str(tmp / "perm.tsv")
    n = run_permutation_test(paths["vcf"], snarls_chr, out,
                             pheno_bin=pheno, n_perms=N_PERMS, seed=SEED)
    assert n > 0

    # independent recount with the same kernels
    masks = None
    obs_rows = []
    perms = []
    gen = iter_chromosome_matrices(paths["vcf"], 2 * len(pheno),
                                   snarls_chr)
    for chrom, matrix in gen:
        for packed in pack_chromosome_chunks(snarls_chr[chrom], matrix,
                                             8192):
            if masks is None:
                W = packed.packed_words().shape[1]
                masks = permutation_masks(pheno, N_PERMS, SEED, W)
            obs, perm = binary_permutation_stats(packed, pheno, masks,
                                                 3, 5, 0.05)
            S = len(packed.snarls)
            obs_rows.extend(
                (s.snarl_id_str, obs[i]) for i, s in
                enumerate(packed.snarls))
            perms.append(perm[:, :S])
    allperm = np.concatenate(perms, axis=1)
    null_min = allperm.min(axis=1)

    got = {}
    with open(out) as fh:
        fh.readline()
        for line in fh:
            c = line.rstrip("\n").split("\t")
            got[c[3]] = (c[4], c[5], c[6])
    assert set(got) == {sid for sid, _o in obs_rows}
    checked = 0
    order = [s for s, _ in obs_rows]
    for sid, o in obs_rows:
        stat_s, emp_s, fwer_s = got[sid]
        if not np.isfinite(o):
            assert stat_s == emp_s == fwer_s == "NA"
            continue
        i = order.index(sid)
        exc = int(np.sum(allperm[:, i] <= o))
        fw = int(np.sum(null_min <= o))
        assert emp_s == set_precision((1 + exc) / (N_PERMS + 1)), sid
        assert fwer_s == set_precision((1 + fw) / (N_PERMS + 1)), sid
        assert float(fwer_s) >= float(emp_s) - 1e-12
        checked += 1
    assert checked > 0


def test_detects_real_association(tmp_path):
    """A strongly-associated snarl must reach the smallest achievable
    empirical p (1/(K+1)) and small FWER p."""
    from stoat_tpu.pipeline.permutation import run_permutation_test

    n_samples = 40
    samples = [f"s{i}" for i in range(n_samples)]
    pheno = np.array([i % 2 == 0 for i in range(n_samples)])
    vcf = tmp_path / "a.vcf"
    with open(vcf, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n##contig=<ID=c1>\n")
        fh.write('##INFO=<ID=AT,Number=R,Type=String,Description="x">\n')
        fh.write('##INFO=<ID=LV,Number=1,Type=Integer,Description="x">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                 "\t" + "\t".join(samples) + "\n")
        # strong but imperfect association: a PERFECT split is filtered
        # by the reference's per-path MAF criterion (group1 share 0 or 1
        # → maf 0, snarl_analyzer.cpp:705-732 — semantics we reproduce)
        flip = {0, 1, 2, 3}
        gts = ["1/1" if (pheno[i] ^ (i in flip)) else "0/0"
               for i in range(n_samples)]
        fh.write("c1\t100\tA\tA\tT\t99\tPASS\tAT=>1>3,>1>2>3;LV=0\tGT\t"
                 + "\t".join(gts) + "\n")
    snarl = tmp_path / "snarl.tsv"
    with open(snarl, "w") as fh:
        fh.write("CHR\tSTART_POS\tEND_POS\tSNARL_HANDLEGRAPH\tSNARL\t"
                 "PATHS\tTYPE\tREF\tDEPTH\n")
        fh.write("c1\t100\t110\t1\t1_3\t>1>3,>1>2>3\t0,1\t1\t1\n")
    from stoat_tpu.io.snarl_file import parse_snarl_path
    snarls_chr = parse_snarl_path(str(snarl))
    out = str(tmp_path / "perm.tsv")
    K = 99
    run_permutation_test(str(vcf), snarls_chr, out, pheno_bin=pheno,
                         n_perms=K, seed=1)
    with open(out) as fh:
        fh.readline()
        cols = fh.readline().rstrip("\n").split("\t")
    assert cols[5] == "1.0000e-02"     # 1/(K+1), K=99, %.4e form
    assert float(cols[6]) <= 0.05


def test_dual_single_pass_matches_separate(data):
    """-b AND -q permutations in one VCF pass: outputs identical to two
    separate passes (same seed → same permutation set)."""
    import filecmp

    from stoat_tpu.io.phenotype import parse_quantitative_pheno
    from stoat_tpu.pipeline.permutation import run_permutation_test

    paths, snarls_chr, pheno, samples, tmp = data
    pheno_q = parse_quantitative_pheno(paths["quantitative"], samples)
    b1 = str(tmp / "dual_b.tsv")
    q1 = str(tmp / "dual_q.tsv")
    run_permutation_test(paths["vcf"], snarls_chr, b1, pheno_bin=pheno,
                         quantitative_phenotype=pheno_q,
                         output_tsv_quant=q1, n_perms=12, seed=3)
    b2 = str(tmp / "solo_b.tsv")
    q2 = str(tmp / "solo_q.tsv")
    run_permutation_test(paths["vcf"], snarls_chr, b2, pheno_bin=pheno,
                         n_perms=12, seed=3)
    run_permutation_test(paths["vcf"], snarls_chr,
                         quantitative_phenotype=pheno_q,
                         output_tsv_quant=q2, n_perms=12, seed=3)
    assert filecmp.cmp(b1, b2, shallow=False)
    assert filecmp.cmp(q1, q2, shallow=False)


def test_quantitative_permutations(data):
    from stoat_tpu.io.phenotype import parse_quantitative_pheno
    from stoat_tpu.pipeline.permutation import run_permutation_test

    paths, snarls_chr, _pb, samples, tmp = data
    pheno_q = parse_quantitative_pheno(paths["quantitative"], samples)
    out = str(tmp / "perm_q.tsv")
    n = run_permutation_test(paths["vcf"], snarls_chr,
                             quantitative_phenotype=pheno_q,
                             output_tsv_quant=out, n_perms=20, seed=5)
    assert n > 0
    with open(out) as fh:
        header = fh.readline().rstrip("\n").split("\t")
        rows = [ln.rstrip("\n").split("\t") for ln in fh]
    assert header[4] == "P_ASY"
    assert len(rows) == sum(len(v) for v in snarls_chr.values())
    finite = [r for r in rows if r[4] != "NA"]
    assert finite
    for r in finite:
        assert float(r[6]) >= float(r[5]) - 1e-12     # FWER >= empirical
        assert 1 / 21 - 1e-6 <= float(r[5]) <= 1.0


def test_cli_flag(data):
    from stoat_tpu.cli import main as cli_main

    paths, snarls_chr, pheno, samples, tmp = data
    out = tmp / "cli_out"
    rc = cli_main(["vcf", "-s", paths["snarl"], "-v", paths["vcf"],
                   "-b", paths["binary"], "-q", paths["quantitative"],
                   "-o", str(out), "--permutations", "10",
                   "--perm-seed", "3"])
    assert rc == 0
    for name in ("binary_permutation_vcf.tsv",
                 "quantitative_permutation_vcf.tsv"):
        perm_tsv = out / name
        assert perm_tsv.exists(), name
        with open(perm_tsv) as fh:
            header = fh.readline().rstrip("\n").split("\t")
            n_rows = sum(1 for _ in fh)
        assert header == ["#CHR", "START_POS", "END_POS", "SNARL",
                          "P_ASY", "P_EMP", "P_FWER"]
        assert n_rows == sum(len(v) for v in snarls_chr.values())


def test_freedman_lane_reduces_to_plain_permutation(data):
    """With no covariates the reduced fit is the permutation-invariant
    mean, so Freedman-Lane phenotypes == plainly permuted phenotypes."""
    from stoat_tpu.pipeline.permutation import (freedman_lane_phenos,
                                                permutation_indices)

    rng = np.random.default_rng(0)
    y = rng.standard_normal(30) * 2 + 1
    idx = permutation_indices(30, 5, 9)
    fl = freedman_lane_phenos(y, None, idx)
    np.testing.assert_allclose(fl, y[idx], rtol=0, atol=1e-12)


def test_covariate_adjusted_observed_p_matches_main_pipeline(data):
    """With -c, the permutation file's observed P_ASY must be the SAME
    covariate-adjusted OLS p the main quantitative_covar analysis
    reports (same test, same filtration)."""
    from stoat_tpu.io.phenotype import (parse_covariates,
                                        parse_quantitative_pheno)
    from stoat_tpu.pipeline.permutation import run_permutation_test
    from stoat_tpu.pipeline.runner import run_vcf_analysis

    paths, snarls_chr, _pb, samples, tmp = data
    pheno_q = parse_quantitative_pheno(paths["quantitative"], samples)
    covar = parse_covariates(paths["covariate"], ["AGE", "SEX"], samples)

    main_out = str(tmp / "main_covar.tsv")
    run_vcf_analysis(paths["vcf"], snarls_chr, main_out, "quantitative",
                     quantitative_phenotype=pheno_q, covariate=covar,
                     sample_names=samples, use_mesh=False)
    main_p = {}
    with open(main_out) as fh:
        fh.readline()
        for line in fh:
            c = line.rstrip("\n").split("\t")
            main_p[c[3]] = c[5]

    perm_out = str(tmp / "perm_covar.tsv")
    run_permutation_test(paths["vcf"], snarls_chr,
                         quantitative_phenotype=pheno_q,
                         output_tsv_quant=perm_out, covariate=covar,
                         n_perms=10, seed=2)
    checked = 0
    with open(perm_out) as fh:
        fh.readline()
        for line in fh:
            c = line.rstrip("\n").split("\t")
            if c[4] == "NA":
                continue
            assert c[3] in main_p
            assert c[4] == main_p[c[3]], c[3]
            checked += 1
    assert checked > 0


def test_freedman_lane_permuted_arm_with_covariates():
    """With a real covariate the FL phenotypes must be fit + permuted
    residuals (checked against an independent pinv projection) and must
    DIFFER from plain label permutation — a regression to y[perm]
    (ignoring the covariate) fails here."""
    from stoat_tpu.pipeline.permutation import (freedman_lane_phenos,
                                                permutation_indices)

    rng = np.random.default_rng(4)
    n = 50
    covar = rng.standard_normal((n, 2))
    y = 3.0 * covar[:, 0] - 1.5 * covar[:, 1] + rng.standard_normal(n)
    idx = permutation_indices(n, 6, 11)
    fl = freedman_lane_phenos(y, covar, idx)

    Z = np.concatenate([np.ones((n, 1)), covar], axis=1)
    fit = Z @ (np.linalg.pinv(Z) @ y)       # independent projection
    resid = y - fit
    np.testing.assert_allclose(fl, fit[None, :] + resid[idx],
                               rtol=0, atol=1e-9)
    # and it is NOT plain label permutation when covariates matter
    assert not np.allclose(fl, y[idx])


def test_mesh_sharded_matches_single_device(data, tmp_path):
    """Round-5: the permutation pass sharded over the 8-device CPU mesh
    (binary_perm_pvalues_sharded / quant_perm_pvalues_sharded) must
    write byte-identical outputs to the single-device path — the same
    mesh-shape value-parity contract as the main pipeline
    (test_runner_mesh)."""
    import filecmp

    from stoat_tpu.io.phenotype import parse_quantitative_pheno
    from stoat_tpu.pipeline.permutation import run_permutation_test

    paths, snarls_chr, pheno, samples, _tmp = data
    pheno_q = parse_quantitative_pheno(paths["quantitative"], samples)
    b1 = str(tmp_path / "b_single.tsv")
    q1 = str(tmp_path / "q_single.tsv")
    b2 = str(tmp_path / "b_mesh.tsv")
    q2 = str(tmp_path / "q_mesh.tsv")
    run_permutation_test(paths["vcf"], snarls_chr, b1, pheno_bin=pheno,
                         n_perms=N_PERMS, seed=SEED,
                         quantitative_phenotype=pheno_q,
                         output_tsv_quant=q1, use_mesh=False)
    run_permutation_test(paths["vcf"], snarls_chr, b2, pheno_bin=pheno,
                         n_perms=N_PERMS, seed=SEED,
                         quantitative_phenotype=pheno_q,
                         output_tsv_quant=q2, use_mesh=True)
    assert filecmp.cmp(b1, b2, shallow=False)
    assert filecmp.cmp(q1, q2, shallow=False)
    # the quantitative COVARIATE arm (Freedman-Lane + with_covar design
    # inside the shard) must also match byte for byte
    rng = np.random.default_rng(0)
    covar = rng.standard_normal((len(samples), 2))
    qc1 = str(tmp_path / "qc_single.tsv")
    qc2 = str(tmp_path / "qc_mesh.tsv")
    run_permutation_test(paths["vcf"], snarls_chr,
                         quantitative_phenotype=pheno_q,
                         output_tsv_quant=qc1, covariate=covar,
                         n_perms=N_PERMS, seed=SEED, use_mesh=False)
    run_permutation_test(paths["vcf"], snarls_chr,
                         quantitative_phenotype=pheno_q,
                         output_tsv_quant=qc2, covariate=covar,
                         n_perms=N_PERMS, seed=SEED, use_mesh=True)
    assert filecmp.cmp(qc1, qc2, shallow=False)
    # and the covariate run differs from the unadjusted one (the
    # covariate branch is actually exercised, not a no-op)
    assert not filecmp.cmp(q1, qc1, shallow=False)


def _confounded_cohort(tmp_path, n_samples=120, n_snarls=60, seed=5,
                       genotype_effect=0.0):
    """Binary cohort where BOTH the phenotype and the genotypes are
    driven by one covariate (classic confounding): under the null of no
    direct genotype effect given the covariate, an adjusted test must
    stay calibrated while the unadjusted chi² inflates."""
    rng = np.random.default_rng(seed)
    samples = [f"s{i}" for i in range(n_samples)]
    c = rng.standard_normal(n_samples)
    pheno = rng.random(n_samples) < 1.0 / (1.0 + np.exp(-1.5 * c))
    vcf = tmp_path / "conf.vcf"
    snarl = tmp_path / "conf_snarl.tsv"
    with open(vcf, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n##contig=<ID=c1>\n")
        fh.write('##INFO=<ID=AT,Number=R,Type=String,Description="x">\n')
        fh.write('##INFO=<ID=LV,Number=1,Type=Integer,Description="x">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                 "\t" + "\t".join(samples) + "\n")
        p_alt = 1.0 / (1.0 + np.exp(-(1.2 * c + genotype_effect
                                      * pheno)))
        for k in range(n_snarls):
            a = 1 + 3 * k
            hap = (rng.random((n_samples, 2))
                   < p_alt[:, None]).astype(int)
            gts = [f"{hap[i,0]}/{hap[i,1]}" for i in range(n_samples)]
            fh.write(f"c1\t{100+10*k}\tV{k}\tA\tT\t99\tPASS\t"
                     f"AT=>{a}>{a+2},>{a}>{a+1}>{a+2};LV=0\tGT\t"
                     + "\t".join(gts) + "\n")
    with open(snarl, "w") as fh:
        fh.write("CHR\tSTART_POS\tEND_POS\tSNARL_HANDLEGRAPH\tSNARL\t"
                 "PATHS\tTYPE\tREF\tDEPTH\n")
        for k in range(n_snarls):
            a = 1 + 3 * k
            fh.write(f"c1\t{100+10*k}\t{105+10*k}\t{k}\t{a}_{a+2}\t"
                     f">{a}>{a+2},>{a}>{a+1}>{a+2}\t0,1\t1\t1\n")
    return str(vcf), str(snarl), pheno, c


def _perm_pvals(path):
    out = []
    with open(path) as fh:
        fh.readline()
        for line in fh:
            cols = line.rstrip("\n").split("\t")
            if cols[4] != "NA":
                out.append(float(cols[4]))
    return np.array(out)


def test_covariate_adjusted_binary_permutation_calibrated(tmp_path):
    """Round-5 (round-4 verdict item 4): binary + covariates permutes a
    covariate-ADJUSTED score statistic (reduced-model residual
    permutation).  On a confounded null cohort the adjusted observed
    p-values stay calibrated while the unadjusted chi² inflates; the
    FWER p's are valid (≥ empirical, not systematically tiny)."""
    from stoat_tpu.io.snarl_file import parse_snarl_path
    from stoat_tpu.pipeline.permutation import run_permutation_test

    vcf, snarl, pheno, c = _confounded_cohort(tmp_path)
    snarls_chr = parse_snarl_path(snarl)
    out_adj = str(tmp_path / "adj.tsv")
    out_raw = str(tmp_path / "raw.tsv")
    run_permutation_test(vcf, snarls_chr, out_adj, pheno_bin=pheno,
                         n_perms=60, seed=2,
                         covariate=c.reshape(-1, 1), use_mesh=False)
    run_permutation_test(vcf, snarls_chr, out_raw, pheno_bin=pheno,
                         n_perms=60, seed=2, use_mesh=False)
    p_adj = _perm_pvals(out_adj)
    p_raw = _perm_pvals(out_raw)
    assert len(p_adj) >= 40
    # adjusted: roughly uniform under the confounded null
    assert 0.35 <= float(np.mean(p_adj)) <= 0.65, np.mean(p_adj)
    assert float(np.mean(p_adj < 0.05)) <= 0.15
    # unadjusted chi²: visibly inflated on the same cohort
    assert float(np.mean(p_raw)) < float(np.mean(p_adj)) - 0.1
    assert float(np.mean(p_raw < 0.05)) > 0.3


def test_covariate_adjusted_binary_permutation_detects_signal(tmp_path):
    """With a real genotype→phenotype effect ON TOP of the confounder,
    the adjusted permutation must still find small p-values (power is
    not destroyed by the adjustment)."""
    from stoat_tpu.io.snarl_file import parse_snarl_path
    from stoat_tpu.pipeline.permutation import run_permutation_test

    vcf, snarl, pheno, c = _confounded_cohort(tmp_path, seed=8,
                                              genotype_effect=2.5)
    snarls_chr = parse_snarl_path(snarl)
    out = str(tmp_path / "sig.tsv")
    run_permutation_test(vcf, snarls_chr, out, pheno_bin=pheno,
                         n_perms=60, seed=2,
                         covariate=c.reshape(-1, 1), use_mesh=False)
    p = _perm_pvals(out)
    assert float(np.mean(p < 0.05)) > 0.5


def test_logistic_score_mesh_matches_single(tmp_path):
    """The sharded score-test permutation (logistic_score_perm_sharded)
    writes byte-identical output to the single-device path."""
    import filecmp

    from stoat_tpu.io.snarl_file import parse_snarl_path
    from stoat_tpu.pipeline.permutation import run_permutation_test

    vcf, snarl, pheno, c = _confounded_cohort(tmp_path, n_samples=40,
                                              n_snarls=20)
    snarls_chr = parse_snarl_path(snarl)
    o1 = str(tmp_path / "s1.tsv")
    o2 = str(tmp_path / "s2.tsv")
    run_permutation_test(vcf, snarls_chr, o1, pheno_bin=pheno,
                         n_perms=20, seed=2,
                         covariate=c.reshape(-1, 1), use_mesh=False)
    run_permutation_test(vcf, snarls_chr, o2, pheno_bin=pheno,
                         n_perms=20, seed=2,
                         covariate=c.reshape(-1, 1), use_mesh=True)
    assert filecmp.cmp(o1, o2, shallow=False)


def test_mesh_chunked_matches_unchunked(data, tmp_path):
    """The mesh branch bounds device memory by sharding in blocks of
    snarl_chunk_size per device (round-5 review item); a tiny chunk
    size forcing MANY blocks must still write byte-identical output."""
    import filecmp

    from stoat_tpu.io.phenotype import parse_quantitative_pheno
    from stoat_tpu.pipeline.permutation import run_permutation_test

    paths, snarls_chr, pheno, samples, _tmp = data
    pheno_q = parse_quantitative_pheno(paths["quantitative"], samples)
    a_b = str(tmp_path / "a_b.tsv")
    a_q = str(tmp_path / "a_q.tsv")
    c_b = str(tmp_path / "c_b.tsv")
    c_q = str(tmp_path / "c_q.tsv")
    run_permutation_test(paths["vcf"], snarls_chr, a_b, pheno_bin=pheno,
                         n_perms=N_PERMS, seed=SEED,
                         quantitative_phenotype=pheno_q,
                         output_tsv_quant=a_q, use_mesh=True)
    run_permutation_test(paths["vcf"], snarls_chr, c_b, pheno_bin=pheno,
                         n_perms=N_PERMS, seed=SEED,
                         quantitative_phenotype=pheno_q,
                         output_tsv_quant=c_q, use_mesh=True,
                         snarl_chunk_size=1)       # 8 snarls per block
    assert filecmp.cmp(a_b, c_b, shallow=False)
    assert filecmp.cmp(a_q, c_q, shallow=False)


def test_python_reader_fallback(data, tmp_path, monkeypatch):
    """Round-5 review: with the native toolchain unavailable the
    permutation pass must run on the Python reader's wordless matrices
    (assemble_words_device used to crash on the missing .words)."""
    import stoat_tpu.native as native

    class Boom:
        def __init__(self, *_a, **_k):
            raise RuntimeError("native core disabled for test")

    monkeypatch.setattr(native, "NativeVcfMatrixReader", Boom)
    from stoat_tpu.pipeline.permutation import run_permutation_test

    paths, snarls_chr, pheno, samples, _tmp = data
    out = str(tmp_path / "fallback.tsv")
    n = run_permutation_test(paths["vcf"], snarls_chr, out,
                             pheno_bin=pheno, n_perms=8, seed=SEED,
                             use_mesh=False)
    assert n > 0
