"""Legacy OLE binary formats (ops/olefmt.py): CFB container, Word 97
.doc piece-table text, Excel 97 BIFF8 cells — stdlib-only, spec-based
([MS-CFB] / [MS-DOC] / [MS-XLS]); fixtures from the module's own
builders (the reference parses these via docx2txt/antiword/xlrd, none
importable here, so the spec subset is the contract)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from agraph_ray.ops.olefmt import (cfb_streams, doc_metadata, make_cfb,
                                   make_doc, make_xls, parse_doc,
                                   parse_xls, xls_metadata)


def test_cfb_roundtrip_mini_and_regular():
    big = bytes(range(256)) * 64          # 16 KiB → regular sectors
    small = b"tiny stream body"           # < 4096 → mini-stream
    medium = b"m" * 5000
    out = cfb_streams(make_cfb({"S": small, "B": big, "M": medium}))
    assert out == {"S": small, "B": big, "M": medium}


def test_cfb_rejects_garbage():
    with pytest.raises(ValueError):
        cfb_streams(b"not an ole file at all")


def test_doc_roundtrip_text():
    text = "First paragraph.\nSecond with ünïcode and\ttab."
    assert parse_doc(make_doc(text)) == text


def test_doc_metadata_fields():
    m = doc_metadata(make_doc("One.\nTwo.\nThree."))
    assert m["format"] == "doc"
    assert "WordDocument" in m["stream_names"]
    assert m["paragraph_count"] == 3
    assert m["character_count"] == len("One.\nTwo.\nThree.")


def test_doc_rejects_non_word_ole():
    payload = make_cfb({"SomeStream": b"x" * 100})
    with pytest.raises(ValueError, match="WordDocument"):
        parse_doc(payload)


def test_xls_rendering_matches_xlsx_contract():
    data = make_xls({"People": [["name", "age"],
                                ["alice", "30"],
                                ["bob", "7"]],
                     "Notes": [["text"], ["hi"]]})
    out = parse_xls(data)
    # identical rendering contract to officefmt.parse_xlsx
    assert out == ("Sheet: People\n"
                   "name  | age\n"
                   "alice | 30 \n"
                   "bob   | 7  \n"
                   "\n"
                   "Sheet: Notes\n"
                   "text\n"
                   "hi  \n")


def test_xls_numbers_and_metadata():
    data = make_xls({"S": [["v"], ["1.5"], ["2"]]})
    out = parse_xls(data)
    assert "1.5" in out and "2  " in out
    m = xls_metadata(data)
    assert m == {"format": "xls", "sheet_names": ["S"], "sheet_count": 1}


def test_parse_documents_ole_dispatch(ray_session):
    import ray.data as rd
    from agraph_ray.ops.parse import parse_documents
    doc = make_doc("from legacy doc")
    xls = make_xls({"S": [["col"], ["from legacy xls"]]})
    t = pa.table({
        "content": pa.array([None, None], pa.string()),
        "content_binary": pa.array([doc, xls], pa.binary()),
        "format": ["doc", "xls"],
    })
    out = parse_documents(rd.from_arrow(t)).to_pandas()
    assert out["text"][0] == "from legacy doc"
    assert "from legacy xls" in out["text"][1]
    assert out["parse_error"].isna().all()
