"""Graphviz export of factor graphs (gtsam/inference/DotWriter analog)."""

from ..base.keys import format_key
from ..graph.graph import FactorGraph


def to_dot(graph: FactorGraph, values=None) -> str:
    """Factor graph -> DOT string: variables as circles, factors as dots."""
    lines = ["graph G {"]
    seen = set()
    fid = 0
    for b in graph.batches:
        for n in range(b.num_factors):
            fname = f"f{fid}"
            lines.append(f'  {fname} [shape=point, label="", xlabel="{b.name}"];')
            for k in b.keys[n]:
                vk = f"v{int(k)}"
                if vk not in seen:
                    seen.add(vk)
                    lines.append(f'  {vk} [label="{format_key(int(k))}"];')
                lines.append(f"  {fname} -- {vk};")
            fid += 1
    lines.append("}")
    return "\n".join(lines)


def save_graph(path: str, graph: FactorGraph, values=None) -> None:
    """NonlinearFactorGraph::saveGraph analog."""
    with open(path, "w") as f:
        f.write(to_dot(graph, values))
