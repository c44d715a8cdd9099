"""Graph layer: GFA loading, snarl decomposition, graph-mode association.

The reference consumes vg's binary formats (.pg/.hg/.gbz + .dist
SnarlDistanceIndex) through the vendored libbdsg/libhandlegraph stack
(/root/reference/src/snarl_data_t.cpp:346-379).  stoat-tpu reads all of
them natively — GFA, HashGraph (.hg), PackedGraph (.pg), and GBZ (.gbz) —
and computes its own snarl decomposition from the graph structure, so no
.dist file is needed:

  - ``stoat_tpu.graph.gfa``: GFA v1 parser (S/L/P/W lines) into a
    bidirected graph with embedded paths
  - ``stoat_tpu.graph.hashgraph`` / ``packedgraph`` / ``gbz``: native
    readers for the vg binary formats (plus a GBZ writer,
    ``stoat_tpu.graph.gbz_write``)
  - ``stoat_tpu.graph.snarls``: superbubble-based snarl tree construction
    (SCC condensation + minimal separable pairs, nested into chains)
  - ``stoat_tpu.graph.decompose``: per-snarl path enumeration to the
    ``snarl_analyse.tsv`` schema (snarl_data_t.cpp:645-773)
  - ``stoat_tpu.graph.association``: graph-mode sample partitioning and
    association tests (partitioner.cpp, graph_path_association_finder.cpp)
"""

from stoat_tpu.graph.gfa import GfaGraph, load_gfa
from stoat_tpu.graph.decompose import decompose_to_snarl_file
from stoat_tpu.graph.association import run_graph_association

__all__ = ["GfaGraph", "load_gfa", "decompose_to_snarl_file",
           "run_graph_association"]
