"""Generate golden (subj, pred, obj) / entity fixtures from the reference.

Runs the reference's deterministic rule-based extraction path
(TextEntityExtractor then TextRelationExtractor — the fixture-defining flow
of agraph/builders/base_builders.py:55-120) on the reassembled conversation
documents of our deterministic synthetic corpus, and writes the results to
tests/fixtures/*.parquet. Offline, run once; the committed fixtures are what
`pytest` gates against (P/R >= 0.95, target exact).

Usage:  python tools/gen_fixtures.py [n_convs] [seed]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "/root/reference")

from refshim import load_reference_extractors  # noqa: E402

from agraph_ray.synth import ground_truth_documents  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def main(n_convs: int = 40, seed: int = 7) -> None:
    TEE, TRE = load_reference_extractors()
    ent_x, rel_x = TEE(), TRE()
    docs = ground_truth_documents(n_convs, seed, skew=False)

    ents_rows, tri_rows = [], []
    for conv_id, text in sorted(docs.items()):
        entities = ent_x.extract_from_text(text)
        relations = rel_x.extract_from_text(text, entities)
        for e in entities:
            et = e.entity_type.value if hasattr(e.entity_type, "value") else e.entity_type
            ents_rows.append({
                "conv_id": conv_id, "name": e.name.lower().strip(),
                "entity_type": et, "confidence": float(e.confidence),
                "source": e.source,
            })
        for r in relations:
            tri_rows.append({
                "conv_id": conv_id,
                "subj": r.head_entity.name.lower().strip(),
                "subj_type": r.head_entity.entity_type.value,
                "pred": r.relation_type.value,
                "obj": r.tail_entity.name.lower().strip(),
                "obj_type": r.tail_entity.entity_type.value,
                "confidence": float(r.confidence),
                "source": r.source,
            })

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(ents_rows),
                   os.path.join(FIXTURE_DIR, f"golden_entities_{n_convs}_{seed}.parquet"))
    pq.write_table(pa.Table.from_pylist(tri_rows),
                   os.path.join(FIXTURE_DIR, f"golden_triples_{n_convs}_{seed}.parquet"))
    print(f"wrote {len(ents_rows)} entities, {len(tri_rows)} triples "
          f"for {n_convs} convs (seed {seed}) to {FIXTURE_DIR}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40,
         int(sys.argv[2]) if len(sys.argv) > 2 else 7)
