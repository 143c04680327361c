"""Graph exports: GraphML (LightRAG-compatible keys d0..d11), Cytoscape.js,
D3.js, CSV.

Formats follow the reference exporters byte-layout-wise:
- GraphML keys/attrs: agraph/builders/lightrag_builder.py:589-697
- Cytoscape / D3 dicts: agraph/utils.py:32-147
- CSV: agraph/storage/base_storage.py:604-664

All exporters *stream* node/edge batches from the Datasets
(``iter_batches``) and append to the output incrementally — the driver
never holds the full graph, only the open file handle. For Cytoscape/D3
dict outputs (inherently single-document JSON) a ``max_rows`` guard
refuses accidental full-corpus exports.
"""

from __future__ import annotations

import csv
import io
from typing import Dict, Optional
from xml.sax.saxutils import escape

_GRAPHML_KEYS = [
    ("d0", "node", "entity_id", "string"),
    ("d1", "node", "entity_type", "string"),
    ("d2", "node", "description", "string"),
    ("d3", "node", "source_id", "string"),
    ("d4", "node", "file_path", "string"),
    ("d5", "node", "created_at", "long"),
    ("d6", "edge", "weight", "double"),
    ("d7", "edge", "description", "string"),
    ("d8", "edge", "keywords", "string"),
    ("d9", "edge", "source_id", "string"),
    ("d10", "edge", "file_path", "string"),
    ("d11", "edge", "created_at", "long"),
]


def write_graphml(nodes: "ray.data.Dataset", edges: "ray.data.Dataset",
                  path: str) -> int:
    """Stream nodes+edges to a LightRAG-compatible GraphML file
    (lightrag_builder.py:589-697: d0=name, d1=type, d2=description,
    d6=confidence weight; empty values omitted). Returns element count."""
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="utf-8"?>\n')
        f.write('<graphml xmlns="http://graphml.graphdrawing.org/xmlns" '
                'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" '
                'xsi:schemaLocation="http://graphml.graphdrawing.org/xmlns '
                'http://graphml.graphdrawing.org/xmlns/1.0/graphml.xsd">\n')
        for kid, for_t, name, typ in _GRAPHML_KEYS:
            f.write(f'  <key id="{kid}" for="{for_t}" attr.name="{name}" '
                    f'attr.type="{typ}"/>\n')
        f.write('  <graph edgedefault="undirected">\n')
        for b in nodes.select_columns(
                ["entity_id", "name", "entity_type", "description"]
        ).iter_batches(batch_size=None, batch_format="pyarrow"):
            for row in b.to_pylist():
                f.write(f'    <node id="{escape(row["entity_id"])}">\n')
                for key, val in (("d0", row["name"]),
                                 ("d1", row["entity_type"]),
                                 ("d2", row["description"])):
                    if val:
                        f.write(f'      <data key="{key}">{escape(str(val))}'
                                '</data>\n')
                f.write('    </node>\n')
                n += 1
        edge_cols = ["head_id", "tail_id", "confidence"]
        has_desc = "description" in edges.schema().names
        if has_desc:
            edge_cols.append("description")
        for b in edges.select_columns(edge_cols).iter_batches(
                batch_size=None, batch_format="pyarrow"):
            for row in b.to_pylist():
                f.write(f'    <edge source="{escape(row["head_id"])}" '
                        f'target="{escape(row["tail_id"])}">\n')
                f.write(f'      <data key="d6">{row["confidence"]}</data>\n')
                if has_desc and row.get("description"):
                    f.write(f'      <data key="d7">'
                            f'{escape(str(row["description"]))}</data>\n')
                f.write('    </edge>\n')
                n += 1
        f.write('  </graph>\n</graphml>\n')
    return n


def _guard(ds, max_rows: int, what: str):
    c = ds.count()
    if c > max_rows:
        raise ValueError(
            f"{what} export of {c} rows exceeds max_rows={max_rows}; "
            "single-document exports are for canonicalized graphs — "
            "raise max_rows explicitly if intended")


def to_cytoscape(nodes: "ray.data.Dataset", edges: "ray.data.Dataset",
                 graph_name: str = "kg",
                 max_rows: int = 1_000_000) -> Dict:
    """Cytoscape.js elements dict (utils.py:32-88)."""
    _guard(nodes, max_rows, "cytoscape nodes")
    out_nodes, out_edges = [], []
    for b in nodes.select_columns(
            ["entity_id", "name", "entity_type", "description", "confidence",
             "source"]).iter_batches(batch_size=None, batch_format="pyarrow"):
        for r in b.to_pylist():
            out_nodes.append({
                "data": {"id": r["entity_id"], "label": r["name"],
                         "type": r["entity_type"],
                         "description": r["description"],
                         "confidence": r["confidence"],
                         "source": r["source"]},
                "classes": r["entity_type"]})
    for b in edges.select_columns(
            ["relation_id", "head_id", "tail_id", "relation_type",
             "confidence", "source"]).iter_batches(batch_size=None, batch_format="pyarrow"):
        for r in b.to_pylist():
            out_edges.append({
                "data": {"id": r["relation_id"], "source": r["head_id"],
                         "target": r["tail_id"],
                         "label": r["relation_type"],
                         "type": r["relation_type"],
                         "confidence": r["confidence"],
                         "source_info": r["source"]},
                "classes": r["relation_type"]})
    return {"elements": {"nodes": out_nodes, "edges": out_edges},
            "graph_info": {"name": graph_name}}


def to_d3(nodes: "ray.data.Dataset", edges: "ray.data.Dataset",
          graph_name: str = "kg", max_rows: int = 1_000_000) -> Dict:
    """D3.js nodes/links dict with integer node indexes and
    confidence-scaled size (utils.py:91-147)."""
    _guard(nodes, max_rows, "d3 nodes")
    out_nodes, id_map = [], {}
    for b in nodes.select_columns(
            ["entity_id", "name", "entity_type", "description",
             "confidence"]).iter_batches(batch_size=None, batch_format="pyarrow"):
        for r in b.to_pylist():
            i = len(out_nodes)
            id_map[r["entity_id"]] = i
            out_nodes.append({
                "id": i, "entity_id": r["entity_id"], "name": r["name"],
                "type": r["entity_type"], "description": r["description"],
                "confidence": r["confidence"], "group": r["entity_type"],
                "size": max(5, min(20, r["confidence"] * 15))})
    links = []
    for b in edges.select_columns(
            ["relation_id", "head_id", "tail_id", "relation_type",
             "confidence"]).iter_batches(batch_size=None, batch_format="pyarrow"):
        for r in b.to_pylist():
            if r["head_id"] in id_map and r["tail_id"] in id_map:
                links.append({
                    "source": id_map[r["head_id"]],
                    "target": id_map[r["tail_id"]],
                    "relation_id": r["relation_id"],
                    "type": r["relation_type"],
                    "confidence": r["confidence"],
                    "value": r["confidence"]})
    return {"nodes": out_nodes, "links": links,
            "graph_info": {"name": graph_name, "node_count": len(out_nodes),
                           "link_count": len(links)}}


def write_csv(nodes: "ray.data.Dataset", edges: "ray.data.Dataset",
              nodes_path: str, edges_path: str) -> Dict[str, int]:
    """Streaming CSV export (base_storage.py:604-664 entity/relation CSVs)."""
    counts = {"nodes": 0, "edges": 0}
    with open(nodes_path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["id", "name", "type", "description", "confidence",
                    "source", "aliases"])
        for b in nodes.select_columns(
                ["entity_id", "name", "entity_type", "description",
                 "confidence", "source", "aliases"]
        ).iter_batches(batch_size=None, batch_format="pyarrow"):
            for r in b.to_pylist():
                w.writerow([r["entity_id"], r["name"], r["entity_type"],
                            r["description"], r["confidence"], r["source"],
                            ";".join(r["aliases"] or [])])
                counts["nodes"] += 1
    with open(edges_path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["id", "head_id", "tail_id", "type", "confidence",
                    "source"])
        for b in edges.select_columns(
                ["relation_id", "head_id", "tail_id", "relation_type",
                 "confidence", "source"]).iter_batches(batch_size=None, batch_format="pyarrow"):
            for r in b.to_pylist():
                w.writerow([r["relation_id"], r["head_id"], r["tail_id"],
                            r["relation_type"], r["confidence"], r["source"]])
                counts["edges"] += 1
    return counts


def parse_graphml(path: str) -> Dict[str, list]:
    """Inverse of write_graphml (lightrag_builder.py:383-559 parse path):
    returns {"nodes": [...], "edges": [...]} dict rows."""
    import xml.etree.ElementTree as ET
    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
    root = ET.parse(path).getroot()
    key_names = {k.get("id"): k.get("attr.name")
                 for k in root.findall("g:key", ns)}
    nodes, edges = [], []
    graph = root.find("g:graph", ns)
    for el in graph.findall("g:node", ns):
        row = {"id": el.get("id")}
        for d in el.findall("g:data", ns):
            row[key_names.get(d.get("key"), d.get("key"))] = d.text
        nodes.append(row)
    for el in graph.findall("g:edge", ns):
        row = {"source": el.get("source"), "target": el.get("target")}
        for d in el.findall("g:data", ns):
            row[key_names.get(d.get("key"), d.get("key"))] = d.text
        edges.append(row)
    return {"nodes": nodes, "edges": edges}
