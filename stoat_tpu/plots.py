"""QQ and Manhattan plots from result TSVs.

Equivalent of /root/reference/plot_script/qq_mahanttan_plot.py (which uses
pandas+qmplot) in pure matplotlib/numpy: reads the output TSVs of any mode,
takes the mode's p-value column (P for quantitative/covar/eQTL, P_FISHER or
P_CHI2 for binary), and renders observed-vs-expected -log10(p) and
per-chromosome position scatter.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

__all__ = ["read_pvalues", "qq_plot", "manhattan_plot"]


def read_pvalues(tsv_path: str, p_column: Optional[str] = None
                 ) -> Tuple[np.ndarray, List[str], np.ndarray]:
    """Return (p-values, chromosomes, positions) from a results TSV.

    ``p_column`` defaults to "P" if present, else "P_FISHER".
    """
    with open(tsv_path) as fh:
        header = fh.readline().rstrip("\n").lstrip("#").split("\t")
        if p_column is None:
            p_column = "P" if "P" in header else "P_FISHER"
        try:
            p_idx = header.index(p_column)
        except ValueError:
            raise ValueError(f"column {p_column} not in {header}")
        chr_idx = header.index("CHR")
        pos_idx = header.index("START_POS")
        pvals: List[float] = []
        chroms: List[str] = []
        positions: List[int] = []
        for line in fh:
            cols = line.rstrip("\n").split("\t")
            if len(cols) <= p_idx:
                continue
            value = cols[p_idx]
            if value == "NA" or value == "":
                continue
            pvals.append(float(value))
            chroms.append(cols[chr_idx])
            positions.append(int(cols[pos_idx]))
    return np.array(pvals), chroms, np.array(positions)


def qq_plot(tsv_path: str, output_png: str,
            p_column: Optional[str] = None) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    p, _, _ = read_pvalues(tsv_path, p_column)
    p = np.clip(np.sort(p), 1e-300, 1.0)
    n = len(p)
    expected = -np.log10((np.arange(n) + 0.5) / n)
    observed = -np.log10(p)[::-1]

    fig, ax = plt.subplots(figsize=(6, 6), facecolor="w", edgecolor="k")
    ax.scatter(sorted(expected), sorted(observed), s=8, alpha=0.7)
    lim = max(expected.max() if n else 1, observed.max() if n else 1)
    ax.plot([0, lim], [0, lim], "r--", lw=1)
    ax.set_xlabel(r"Expected $-log_{10}(P)$")
    ax.set_ylabel(r"Observed $-log_{10}(P)$")
    ax.set_title("QQ plot")
    fig.savefig(output_png, dpi=120)
    plt.close(fig)


def manhattan_plot(tsv_path: str, output_png: str,
                   p_column: Optional[str] = None,
                   sign_threshold: float = 1e-6) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    p, chroms, positions = read_pvalues(tsv_path, p_column)
    p = np.clip(p, 1e-300, 1.0)
    logp = -np.log10(p)

    chrom_order = sorted(set(chroms))
    offsets = {}
    cum = 0
    for c in chrom_order:
        cpos = positions[[i for i, x in enumerate(chroms) if x == c]]
        offsets[c] = cum
        cum += (cpos.max() if len(cpos) else 0) + 1

    x = np.array([offsets[c] + pos for c, pos in zip(chroms, positions)])
    colors = np.array([chrom_order.index(c) % 2 for c in chroms])

    fig, ax = plt.subplots(figsize=(12, 4), facecolor="w", edgecolor="k")
    for parity, color in ((0, "#4C72B0"), (1, "#55A868")):
        mask = colors == parity
        ax.scatter(x[mask], logp[mask], s=8, color=color, alpha=0.8)
    significant = p < sign_threshold
    if significant.any():
        ax.scatter(x[significant], logp[significant], s=14, color="r")
    ax.axhline(-np.log10(sign_threshold), color="r", ls="--", lw=1)
    ax.set_xlabel("Chromosome position")
    ax.set_ylabel(r"$-log_{10}(P)$")
    ax.set_title("Manhattan plot")
    fig.savefig(output_png, dpi=120)
    plt.close(fig)
