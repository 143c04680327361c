"""Filesystem document sources: directory scan + jsonl corpus reads."""

import json

import pytest


@pytest.fixture()
def doc_dir(tmp_path):
    (tmp_path / "a.txt").write_text("plain text body")
    (tmp_path / "b.md").write_text("# Title\n\nsome *markdown*")
    (tmp_path / "c.json").write_text('{"k": "json text value"}')
    from agraph_ray.ops.officefmt import make_docx, make_pdf
    (tmp_path / "d.pdf").write_bytes(make_pdf(["pdf body text"]))
    (tmp_path / "f.docx").write_bytes(make_docx(["docx body text"]))
    (tmp_path / "g.pdf").write_bytes(b"%PDF-1.4 truncated garbage")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "e.html").write_text(
        "<html><script>x()</script><body>visible</body></html>")
    (tmp_path / "bad.txt").write_bytes(b"\xff\xfe\x00bad utf8 \x80\x81")
    return str(tmp_path)


def test_read_documents_dir(ray_session, doc_dir):
    import posixpath

    from agraph_ray.sources import read_documents_dir
    rows = {posixpath.basename(r["path"]): r for r in
            read_documents_dir(doc_dir).take_all()}
    assert rows["a.txt"]["text"] == "plain text body"
    md = rows["b.md"]
    assert "markdown" in md["text"] and md["parse_error"] is None
    assert "json text value" in rows["c.json"]["text"]
    assert rows["e.html"]["text"].strip() == "visible"
    # binary formats parse from the raw-bytes column (stdlib parsers)
    assert rows["d.pdf"]["text"] == "pdf body text"
    assert rows["f.docx"]["text"] == "docx body text"
    # a torn/garbage binary yields empty-or-error, never a crash
    g = rows["g.pdf"]
    assert g["text"] in (None, "") or g["parse_error"]
    # doc_id is a stable function of path
    again = {posixpath.basename(r["path"]): r for r in
             read_documents_dir(doc_dir).take_all()}
    assert again["b.md"]["doc_id"] == md["doc_id"]


def test_read_documents_dir_decode_error(ray_session, doc_dir):
    from agraph_ray.sources import read_documents_dir
    rows = read_documents_dir(doc_dir).take_all()
    bad = [r for r in rows if r["decode_error"]]
    assert len(bad) == 1 and "UnicodeDecodeError" in bad[0]["decode_error"]


def test_read_documents_dir_format_filter(ray_session, doc_dir):
    from agraph_ray.sources import read_documents_dir
    rows = read_documents_dir(doc_dir, formats=["md"]).take_all()
    assert [r["format"] for r in rows] == ["md"]


def test_read_jsonl_documents(ray_session, tmp_path):
    p = tmp_path / "corpus.jsonl"
    with open(p, "w") as f:
        for i in range(5):
            f.write(json.dumps({"id": f"d{i}", "text": f"doc {i}"}) + "\n")
    from agraph_ray.sources import read_jsonl_documents
    rows = sorted(read_jsonl_documents(str(p), id_field="id").take_all(),
                  key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == [f"d{i}" for i in range(5)]
    assert rows[0]["text"] == "doc 0"
    # no id field → stable content hash ids
    rows2 = read_jsonl_documents(str(p)).take_all()
    assert all(len(r["doc_id"]) == 16 for r in rows2)


# ---------------------------------------------------------------------------
# sized_read_parquet + keyed_sum
# ---------------------------------------------------------------------------


@pytest.fixture()
def small_parquet(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table({"k": np.arange(10_000) % 137,
                  "v": np.arange(10_000, dtype="float64"),
                  "w": np.ones(10_000, dtype="int64"),
                  "txt": ["x" * 50] * 10_000})
    p = tmp_path / "t.parquet"
    pq.write_table(t, p)
    return str(p)


def test_sized_read_small_file_few_blocks(ray_session, small_parquet):
    from agraph_ray.sources import (parquet_in_memory_bytes,
                                    sized_read_parquet)
    # footer estimate accounts for column pruning
    all_b = parquet_in_memory_bytes(small_parquet)
    pruned = parquet_in_memory_bytes(small_parquet, ["k", "v"])
    assert 0 < pruned < all_b
    ds = sized_read_parquet(small_parquet, columns=["k", "v"])
    # tiny table → the 8-block floor, far below Ray's 2xCPU default
    assert ds.materialize().num_blocks() == 8
    assert ds.count() == 10_000
    # explicit override wins
    ds2 = sized_read_parquet(small_parquet, columns=["k"],
                             override_num_blocks=3)
    assert ds2.materialize().num_blocks() == 3


def test_sized_read_respects_large_estimate(ray_session, small_parquet):
    from agraph_ray.sources import sized_read_parquet
    # a 1-byte target makes the byte-derived count exceed the default
    # parallelism → the stock reader path (no tiny-block override)
    ds = sized_read_parquet(small_parquet, target_block_bytes=1)
    assert ds.count() == 10_000


def test_keyed_sum_matches_pandas(ray_session, small_parquet):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from agraph_ray.stages.common import keyed_sum
    ds = rd.read_parquet(small_parquet, columns=["k", "v", "w"])
    out = keyed_sum(ds, ["k"], {"v": "sv", "w": "cnt"},
                    key_schema=[pa.field("k", pa.int64())]).to_pandas()
    # sum dtype follows the input column: float v -> float64, int w -> int64
    assert str(out["sv"].dtype) == "float64"
    assert str(out["cnt"].dtype) == "int64"
    df = pd.read_parquet(small_parquet, columns=["k", "v", "w"])
    want = (df.groupby("k", as_index=False)
            .agg(sv=("v", "sum"), cnt=("w", "sum")))
    got = out.sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    assert (got["cnt"] == want["cnt"]).all()
    assert (got["sv"].astype("float64") == want["sv"]).all()
    assert len(got) == 137
