"""Database-schema entity/relation extraction.

Reference semantics (agraph/extractors/entity_extractor.py:354-596,
agraph/extractors/relation_extractor.py:490-742):
- DATABASE / TABLE / COLUMN entities, confidence 1.0, source
  "database_extraction"; table aliases strip tbl_/tb_/t_ prefixes; common
  columns (id, created_at, updated_at, deleted_at) skipped; column entity
  name = "table.column" with the bare column name as alias.
- Business CONCEPT entities inferred from table-name keywords, conf 0.7.
- Relations: database CONTAINS table, table CONTAINS column (conf 1.0),
  column FOREIGN_KEY column (conf 1.0), table SIMILAR_TO table by
  underscore-token Jaccard > 0.6.

Ray-Data shape: the input is a flat *columns table* — one row per column:
(database, table_name, column_name, data_type, is_primary_key,
fk_table, fk_column, table_comment, column_comment) — the natural
relational encoding of the reference's nested schema dict. Entity and
structural-relation extraction are per-batch maps grouped by table inside
the batch (schemas are batch-sized); the table-similarity pass collects the
distinct table list (small) on the driver.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pandas as pd
import pyarrow as pa

from ..ids import entity_id, relation_id

TABLE_PREFIXES = ("tbl_", "tb_", "t_")
COMMON_COLUMNS = {"id", "created_at", "updated_at", "deleted_at"}
CONCEPT_MAPPING = {
    "user": "User Management", "customer": "Customer Management",
    "order": "Order Management", "product": "Product Management",
    "inventory": "Inventory Management", "payment": "Payment Processing",
    "shipment": "Shipping Management", "category": "Category Management",
    "review": "Review System", "cart": "Shopping Cart",
    "wishlist": "Wishlist Management",
}

SCHEMA_ENTITY_SCHEMA = pa.schema([
    ("entity_id", pa.string()), ("name", pa.string()),
    ("entity_type", pa.string()), ("description", pa.string()),
    ("aliases", pa.list_(pa.string())), ("confidence", pa.float64()),
    ("source", pa.string()),
])

SCHEMA_RELATION_SCHEMA = pa.schema([
    ("relation_id", pa.string()), ("head_id", pa.string()),
    ("tail_id", pa.string()), ("relation_type", pa.string()),
    ("subj", pa.string()), ("obj", pa.string()),
    ("confidence", pa.float64()), ("source", pa.string()),
])


def clean_table_name(name: str) -> str:
    """Strip tbl_/tb_/t_ prefixes (entity_extractor.py:545-563)."""
    low = name.lower()
    for p in TABLE_PREFIXES:
        if low.startswith(p):
            return low[len(p):]
    return low


def infer_business_concepts(clean_name: str) -> List[str]:
    """Keyword → concept mapping (entity_extractor.py:565-596)."""
    return sorted({c for k, c in CONCEPT_MAPPING.items() if k in clean_name})


def name_jaccard(a: str, b: str) -> float:
    """Underscore-token Jaccard (relation_extractor.py:718-742)."""
    s1, s2 = set(a.lower().split("_")), set(b.lower().split("_"))
    u = s1 | s2
    return len(s1 & s2) / len(u) if u else 0.0


def _ent(name, etype, desc, aliases=(), conf=1.0,
         source="database_extraction"):
    return {"entity_id": entity_id(name), "name": name,
            "entity_type": etype, "description": desc,
            "aliases": list(aliases), "confidence": conf, "source": source}


def _rel(subj, rtype, obj, conf=1.0, source="database_schema"):
    return {"relation_id": relation_id(subj, rtype, obj),
            "head_id": entity_id(subj), "tail_id": entity_id(obj),
            "relation_type": rtype, "subj": subj, "obj": obj,
            "confidence": conf, "source": source}


def _extract_batch(t: pa.Table):
    """One batch of column rows → (entity rows, relation rows)."""
    df = t.to_pandas()
    ents: Dict[str, dict] = {}
    rels: Dict[str, dict] = {}

    def add_e(row):
        ents.setdefault(row["entity_id"], row)

    def add_r(row):
        rels.setdefault(row["relation_id"], row)

    for (db, table), g in df.groupby(["database", "table_name"], sort=False):
        if db:
            add_e(_ent(db, "database", f"Database: {db}"))
            add_r(_rel(db, "contains", table))
        clean = clean_table_name(table)
        aliases = [clean] if clean != table else []
        comment = (g["table_comment"].iloc[0]
                   if "table_comment" in g else "") or f"Data table: {table}"
        add_e(_ent(table, "table", comment, aliases))
        for c in infer_business_concepts(clean):
            add_e(_ent(c, "concept", f"Business concept: {c}", conf=0.7,
                       source="business_inference"))
        for _, col in g.iterrows():
            cname = col["column_name"]
            if not cname or cname.lower() in COMMON_COLUMNS:
                continue
            full = f"{table}.{cname}"
            cdesc = (col.get("column_comment") or f"Data column: {cname}")
            add_e(_ent(full, "column", cdesc, [cname]))
            add_r(_rel(table, "contains", full))
            fk_t, fk_c = col.get("fk_table"), col.get("fk_column")
            if fk_t and fk_c:
                add_r(_rel(full, "foreign_key", f"{fk_t}.{fk_c}"))
    return list(ents.values()), list(rels.values())


def extract_schema_entities(columns_ds: "ray.data.Dataset",
                            ) -> "ray.data.Dataset":
    """columns table → entity rows (deduped globally on entity_id)."""
    from ..stages.common import distinct_on

    def f(t: pa.Table) -> pa.Table:
        ents, _ = _extract_batch(t)
        return pa.Table.from_pylist(ents, schema=SCHEMA_ENTITY_SCHEMA)

    out = columns_ds.map_batches(f, batch_format="pyarrow")
    return distinct_on(out, ["entity_id"])


def extract_schema_relations(columns_ds: "ray.data.Dataset",
                             similarity_threshold: float = 0.6,
                             ) -> "ray.data.Dataset":
    """columns table → relation rows: structural CONTAINS / FOREIGN_KEY per
    batch + global table-name SIMILAR_TO (the distinct table list is tiny —
    collected once, pairs generated on the driver)."""
    import ray.data as rd

    from ..stages.common import distinct_on

    def f(t: pa.Table) -> pa.Table:
        _, rels = _extract_batch(t)
        return pa.Table.from_pylist(rels, schema=SCHEMA_RELATION_SCHEMA)

    structural = columns_ds.map_batches(f, batch_format="pyarrow")

    tables = sorted(set(
        columns_ds.select_columns(["table_name"]).unique("table_name")))
    sim_rows = []
    for i, t1 in enumerate(tables):
        for t2 in tables[i + 1:]:
            s = name_jaccard(t1, t2)
            if s > similarity_threshold:
                sim_rows.append(_rel(t1, "similar_to", t2, conf=s,
                                     source="name_similarity"))
    sim = rd.from_arrow(pa.Table.from_pylist(sim_rows,
                                             schema=SCHEMA_RELATION_SCHEMA))
    return distinct_on(structural.union(sim), ["relation_id"])
