"""Stdlib parsers for the legacy OLE binary formats: .doc and .xls.

Both are Compound File Binary (CFB / "OLE2") containers — a FAT-style
sector filesystem holding named streams ([MS-CFB]). Inside:

- .doc (Word 97-2003, [MS-DOC]): the ``WordDocument`` stream holds the
  FIB; the piece table (Clx → PlcPcd) in the ``0Table``/``1Table``
  stream maps character positions to file offsets, each piece either
  UTF-16LE or "compressed" cp1252. Text = pieces concatenated.
- .xls (Excel 97-2003 BIFF8, [MS-XLS]): the ``Workbook`` stream is a
  flat record sequence; sheet names from BOUNDSHEET, shared strings
  from SST (with CONTINUE handling for the common same-encoding case),
  cells from LABELSST / NUMBER / RK. Rendered like the xlsx path
  ("Sheet: name" + aligned table — spreadsheet_processor.py:196-281).

The ``make_doc`` / ``make_xls`` builders write the same subset (a real
CFB with FAT + mini-FAT, a minimal FIB + one-piece piece table, a
minimal BIFF8 record stream) for round-trip tests — the reference
parses these formats through docx2txt/antiword/xlrd, none of which
exist here, so the spec is the contract.

Edge cases beyond the common subset (encrypted documents, fastsaved
multi-piece revisions with grpprl blocks, BIFF5, formula-only cells)
raise NotImplementedError naming what is missing.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD

# ---------------------------------------------------------------------------
# CFB container — read
# ---------------------------------------------------------------------------


def _read_chain(payload: bytes, fat: np.ndarray, start: int,
                sec_size: int, base: int) -> bytes:
    out = []
    s = start
    seen = 0
    while s != _ENDOFCHAIN and s != _FREE:
        off = base + s * sec_size
        out.append(payload[off:off + sec_size])
        s = int(fat[s])
        seen += 1
        if seen > len(fat) + 1:
            raise ValueError("CFB FAT chain cycle")
    return b"".join(out)


def cfb_streams(payload) -> Dict[str, bytes]:
    """CFB container → {stream name: bytes} (root level + all depths;
    names are the directory entry names, storage hierarchy flattened)."""
    from .officefmt import _as_bytes
    payload = _as_bytes(payload)
    if payload[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE compound file (bad magic)")
    sector_shift = struct.unpack_from("<H", payload, 30)[0]
    mini_shift = struct.unpack_from("<H", payload, 32)[0]
    sec_size = 1 << sector_shift
    mini_size = 1 << mini_shift
    n_fat = struct.unpack_from("<I", payload, 44)[0]
    dir_start = struct.unpack_from("<I", payload, 48)[0]
    mini_cutoff = struct.unpack_from("<I", payload, 56)[0]
    minifat_start = struct.unpack_from("<I", payload, 60)[0]
    difat_start = struct.unpack_from("<I", payload, 68)[0]
    n_difat = struct.unpack_from("<I", payload, 72)[0]

    # FAT sector list: 109 entries in the header DIFAT + chained DIFAT
    difat = list(struct.unpack_from("<109I", payload, 76))
    s = difat_start
    for _ in range(n_difat):
        off = 512 + s * sec_size if sec_size == 512 else \
            sec_size + s * sec_size
        ent = struct.unpack_from(f"<{sec_size // 4}I", payload, off)
        difat.extend(ent[:-1])
        s = ent[-1]
    base = sec_size                     # sector 0 starts after the header
    if sec_size == 512:
        base = 512
    fat_parts = []
    for fs in difat[:n_fat]:
        if fs in (_FREE, _ENDOFCHAIN):
            continue
        off = base + fs * sec_size
        fat_parts.append(np.frombuffer(payload, dtype="<u4",
                                       count=sec_size // 4, offset=off))
    fat = np.concatenate(fat_parts) if fat_parts else \
        np.empty(0, dtype="<u4")

    dir_raw = _read_chain(payload, fat, dir_start, sec_size, base)
    entries = []
    for i in range(0, len(dir_raw) - 127, 128):
        e = dir_raw[i:i + 128]
        name_len = struct.unpack_from("<H", e, 64)[0]
        if name_len < 2:
            continue
        name = e[:name_len - 2].decode("utf-16le", "ignore")
        obj_type = e[66]
        start = struct.unpack_from("<I", e, 116)[0]
        size = struct.unpack_from("<Q", e, 120)[0]
        entries.append((name, obj_type, start, size))

    # root entry's chain IS the mini-stream
    root = next((e for e in entries if e[1] == 5), None)
    mini_stream = _read_chain(payload, fat, root[2], sec_size, base) \
        if root and root[2] != _ENDOFCHAIN else b""
    minifat = np.empty(0, dtype="<u4")
    if minifat_start not in (_FREE, _ENDOFCHAIN):
        mf_raw = _read_chain(payload, fat, minifat_start, sec_size, base)
        minifat = np.frombuffer(mf_raw, dtype="<u4")

    out: Dict[str, bytes] = {}
    for name, obj_type, start, size in entries:
        if obj_type != 2:               # streams only
            continue
        if size < mini_cutoff:
            data = []
            s = start
            seen = 0
            while s not in (_ENDOFCHAIN, _FREE) and len(minifat):
                data.append(mini_stream[s * mini_size:(s + 1) * mini_size])
                s = int(minifat[s])
                seen += 1
                if seen > len(minifat) + 1:
                    raise ValueError("CFB mini-FAT chain cycle")
            out[name] = b"".join(data)[:size]
        else:
            out[name] = _read_chain(payload, fat, start, sec_size,
                                    base)[:size]
    return out


# ---------------------------------------------------------------------------
# CFB container — write (512-byte sectors, mini-stream for small streams)
# ---------------------------------------------------------------------------


def make_cfb(streams: Dict[str, bytes]) -> bytes:
    """Minimal valid CFB: header + FAT + directory + mini-FAT +
    mini-stream + stream data. Streams < 4096 bytes go to the
    mini-stream (the spec's cutoff — readers select by size)."""
    SEC, MINI, CUT = 512, 64, 4096
    names = list(streams)
    small = [n for n in names if len(streams[n]) < CUT]
    big = [n for n in names if len(streams[n]) >= CUT]

    # --- mini-stream layout
    mini_data = bytearray()
    mini_chains: Dict[str, Tuple[int, int]] = {}   # name → (start, nsec)
    minifat: List[int] = []
    for n in small:
        d = streams[n]
        nsec = max(1, -(-len(d) // MINI))
        start = len(minifat)
        for i in range(nsec):
            minifat.append(start + i + 1 if i < nsec - 1 else _ENDOFCHAIN)
        mini_data.extend(d.ljust(nsec * MINI, b"\x00"))
        mini_chains[n] = (start, nsec)

    # --- regular sectors: [FAT][DIR][MINIFAT][mini-stream][big streams]
    def nsec_of(nbytes: int) -> int:
        return max(1, -(-nbytes // SEC)) if nbytes else 0

    dir_count = 1 + len(names)
    dir_sectors = max(1, -(-(dir_count * 128) // SEC))
    minifat_sectors = max(1, -(-(len(minifat) * 4) // SEC)) \
        if minifat else 0
    mini_sectors = nsec_of(len(mini_data))
    big_sectors = {n: nsec_of(len(streams[n])) for n in big}
    payload_sectors = (dir_sectors + minifat_sectors + mini_sectors
                       + sum(big_sectors.values()))
    # FAT must also map its own sectors
    fat_sectors = 1
    while (payload_sectors + fat_sectors) * 4 > fat_sectors * SEC:
        fat_sectors += 1
    total = fat_sectors + payload_sectors
    fat = [_FREE] * total

    sec = 0
    for i in range(fat_sectors):
        fat[sec] = _FATSECT
        sec += 1

    def chain(n: int) -> int:
        nonlocal sec
        start = sec
        for i in range(n):
            fat[sec] = sec + 1 if i < n - 1 else _ENDOFCHAIN
            sec += 1
        return start

    dir_start = chain(dir_sectors)
    minifat_start = chain(minifat_sectors) if minifat_sectors else \
        _ENDOFCHAIN
    mini_start = chain(mini_sectors) if mini_sectors else _ENDOFCHAIN
    big_starts = {n: chain(big_sectors[n]) for n in big}

    # --- directory entries
    def dir_entry(name: str, obj_type: int, start: int, size: int,
                  child: int = -1) -> bytes:
        raw = name.encode("utf-16le") + b"\x00\x00"
        e = bytearray(128)
        e[:len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw))
        e[66] = obj_type
        e[67] = 1                       # black
        struct.pack_into("<i", e, 68, -1)   # left sibling
        struct.pack_into("<i", e, 72, -1)   # right sibling
        struct.pack_into("<i", e, 76, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    entries = [dir_entry("Root Entry", 5, mini_start, len(mini_data),
                         child=1 if names else -1)]
    for i, n in enumerate(names):
        if n in mini_chains:
            start = mini_chains[n][0]
        else:
            start = big_starts[n]
        # simple balanced-ish sibling wiring: a left-leaning chain is
        # valid enough for readers that walk all entries linearly (ours,
        # olefile, LibreOffice's recovery path)
        e = bytearray(dir_entry(n, 2, start, len(streams[n])))
        if i + 1 < len(names):
            struct.pack_into("<i", e, 72, i + 2)    # right sibling
        entries.append(bytes(e))
    dir_raw = b"".join(entries).ljust(dir_sectors * SEC, b"\x00")

    minifat_raw = b"".join(struct.pack("<I", v) for v in minifat) \
        .ljust(minifat_sectors * SEC, b"\xff")
    mini_raw = bytes(mini_data).ljust(mini_sectors * SEC, b"\x00")

    fat_raw = b"".join(struct.pack("<I", v) for v in fat) \
        .ljust(fat_sectors * SEC, b"\xff")

    header = bytearray(512)
    header[:8] = _CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)      # minor version
    struct.pack_into("<H", header, 26, 3)           # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)      # little-endian
    struct.pack_into("<H", header, 30, 9)           # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)           # 64-byte mini
    struct.pack_into("<I", header, 44, fat_sectors)
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, CUT)
    struct.pack_into("<I", header, 60, minifat_start)
    struct.pack_into("<I", header, 64,
                     minifat_sectors if minifat_sectors else 0)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    difat = [_FREE] * 109
    for i in range(fat_sectors):
        difat[i] = i
    struct.pack_into("<109I", header, 76, *difat)

    body_parts = [fat_raw, dir_raw]
    if minifat_sectors:
        body_parts.append(minifat_raw)
    if mini_sectors:
        body_parts.append(mini_raw)
    for n in big:
        body_parts.append(streams[n].ljust(big_sectors[n] * SEC, b"\x00"))
    return bytes(header) + b"".join(body_parts)


# ---------------------------------------------------------------------------
# .doc (Word 97 binary) — text via the piece table
# ---------------------------------------------------------------------------

_FC_CLX_OFF = 0x01A2            # fcClx / lcbClx in FibRgFcLcb97
_FIB_FLAGS_OFF = 0x000A
_F_WHICH_TBL = 0x0200
_F_ENCRYPTED = 0x0100


def parse_doc(payload: bytes) -> str:
    """Word 97-2003 text extraction: FIB → Clx → PlcPcd pieces, each
    UTF-16LE or compressed cp1252. Paragraph marks (\\r) normalized to
    \\n, cell/row marks (\\x07) to tabs/newlines like antiword's plain
    output."""
    streams = cfb_streams(payload)
    wd = streams.get("WordDocument")
    if wd is None:
        raise ValueError("OLE file has no WordDocument stream (not .doc)")
    if struct.unpack_from("<H", wd, 0)[0] != 0xA5EC:
        raise ValueError("bad FIB magic (not a Word 97+ .doc)")
    flags = struct.unpack_from("<H", wd, _FIB_FLAGS_OFF)[0]
    if flags & _F_ENCRYPTED:
        raise NotImplementedError("encrypted .doc not supported")
    tbl_name = "1Table" if flags & _F_WHICH_TBL else "0Table"
    tbl = streams.get(tbl_name) or streams.get(
        "1Table" if tbl_name == "0Table" else "0Table")
    fc_clx, lcb_clx = struct.unpack_from("<II", wd, _FC_CLX_OFF)
    if tbl is None or not lcb_clx:
        raise NotImplementedError(
            "no piece table (pre-Word97 or truncated .doc)")
    clx = tbl[fc_clx:fc_clx + lcb_clx]
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:      # skip Prc grpprls
        cb = struct.unpack_from("<H", clx, pos + 1)[0]
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        raise ValueError("malformed Clx (no Pcdt)")
    lcb = struct.unpack_from("<I", clx, pos + 1)[0]
    plc = clx[pos + 5:pos + 5 + lcb]
    n = (len(plc) - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    parts: List[str] = []
    for i in range(n):
        pcd = plc[4 * (n + 1) + 8 * i:4 * (n + 1) + 8 * (i + 1)]
        fc = struct.unpack_from("<I", pcd, 2)[0]
        n_chars = cps[i + 1] - cps[i]
        if fc & 0x40000000:                          # compressed cp1252
            off = (fc & 0x3FFFFFFF) // 2
            parts.append(wd[off:off + n_chars].decode("cp1252", "replace"))
        else:
            off = fc & 0x3FFFFFFF
            parts.append(wd[off:off + 2 * n_chars]
                         .decode("utf-16le", "replace"))
    text = "".join(parts)
    text = (text.replace("\x07\x07", "\n").replace("\x07", "\t")
            .replace("\r", "\n").replace("\x0b", "\n")
            .replace("\x0c", "\n"))
    # drop remaining control chars (field separators etc.)
    return "".join(ch for ch in text
                   if ch == "\n" or ch == "\t" or ord(ch) >= 32).strip()


def make_doc(text: str) -> bytes:
    """Minimal Word97 .doc: FIB + UTF-16LE text in WordDocument,
    one-piece piece table in 0Table. Paragraphs = lines joined by \\r."""
    body = text.replace("\n", "\r") + "\r"
    raw = body.encode("utf-16le")
    text_off = 0x0800                               # past the FIB
    wd = bytearray(max(text_off + len(raw), 0x0A00))
    struct.pack_into("<H", wd, 0, 0xA5EC)
    struct.pack_into("<H", wd, 2, 0x00C1)           # nFib (Word 97)
    struct.pack_into("<H", wd, _FIB_FLAGS_OFF, 0)   # 0Table, unencrypted
    wd[text_off:text_off + len(raw)] = raw

    n_chars = len(body)
    plc = struct.pack("<II", 0, n_chars)
    pcd = struct.pack("<HIH", 0, text_off, 0)       # fc without bit30:
    #                                               utf-16 at text_off
    pcdt = b"\x02" + struct.pack("<I", len(plc) + len(pcd)) + plc + pcd
    tbl = bytearray(pcdt)
    struct.pack_into("<II", wd, _FC_CLX_OFF, 0, len(pcdt))
    return make_cfb({"WordDocument": bytes(wd), "0Table": bytes(tbl)})


# ---------------------------------------------------------------------------
# .xls (BIFF8) — cells via the Workbook record stream
# ---------------------------------------------------------------------------


def _biff_records(stream: bytes):
    pos = 0
    while pos + 4 <= len(stream):
        op, ln = struct.unpack_from("<HH", stream, pos)
        yield op, stream[pos + 4:pos + 4 + ln], pos
        pos += 4 + ln


def _xl_unicode(data: bytes, pos: int) -> Tuple[str, int]:
    """XLUnicodeRichExtendedString (common subset: no continues)."""
    cch = struct.unpack_from("<H", data, pos)[0]
    grbit = data[pos + 2]
    pos += 3
    rich = grbit & 0x08
    ext = grbit & 0x04
    n_rich = 0
    cb_ext = 0
    if rich:
        n_rich = struct.unpack_from("<H", data, pos)[0]
        pos += 2
    if ext:
        cb_ext = struct.unpack_from("<I", data, pos)[0]
        pos += 4
    if grbit & 0x01:                                 # 16-bit
        s = data[pos:pos + 2 * cch].decode("utf-16le", "replace")
        pos += 2 * cch
    else:
        s = data[pos:pos + cch].decode("latin-1")
        pos += cch
    pos += 4 * n_rich + cb_ext
    return s, pos


def _rk_value(rk: int) -> float:
    div = 100.0 if rk & 1 else 1.0
    if rk & 2:                                       # int * 4
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        return v / div
    return struct.unpack("<d", struct.pack("<Q", (rk & ~3) << 32))[0] / div


def parse_xls(payload: bytes, max_rows: int = 1000,
              include_headers: bool = True) -> str:
    """BIFF8 common-case text: sheet names + SST/LABELSST/NUMBER/RK
    cells, rendered exactly like the xlsx path (Sheet: name + aligned
    table)."""
    from .officefmt import _format_table_rows
    streams = cfb_streams(payload)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError("OLE file has no Workbook stream (not .xls)")
    sst: List[str] = []
    sheets: List[Tuple[str, int]] = []               # (name, stream pos)
    for op, data, pos in _biff_records(wb):
        if op == 0x00FC:                             # SST
            total, unique = struct.unpack_from("<II", data, 0)
            p = 8
            while p < len(data) and len(sst) < unique:
                try:
                    s, p = _xl_unicode(data, p)
                except (struct.error, IndexError):
                    break                            # continued SST tail
                sst.append(s)
        elif op == 0x0085:                           # BOUNDSHEET
            sheet_pos = struct.unpack_from("<I", data, 0)[0]
            cch = data[6]
            grbit = data[7]
            if grbit & 0x01:
                name = data[8:8 + 2 * cch].decode("utf-16le", "replace")
            else:
                name = data[8:8 + cch].decode("latin-1")
            sheets.append((name, sheet_pos))

    out: List[str] = []
    for name, sheet_pos in sheets:
        cells: Dict[Tuple[int, int], str] = {}
        sub = wb[sheet_pos:]
        depth = 0
        for op, data, _ in _biff_records(sub):
            if op == 0x0809:                          # BOF
                depth += 1
                if depth > 1:
                    break
            elif op == 0x000A:                        # EOF
                break
            elif op == 0x00FD:                        # LABELSST
                r, c, _xf, idx = struct.unpack_from("<HHHI", data, 0)
                if idx < len(sst):
                    cells[(r, c)] = sst[idx]
            elif op == 0x0203:                        # NUMBER
                r, c, _xf = struct.unpack_from("<HHH", data, 0)
                v = struct.unpack_from("<d", data, 6)[0]
                cells[(r, c)] = repr(v) if v != int(v) else str(int(v))
            elif op == 0x027E:                        # RK
                r, c, _xf, rk = struct.unpack_from("<HHHI", data, 0)
                v = _rk_value(rk)
                cells[(r, c)] = repr(v) if v != int(v) else str(int(v))
            elif op == 0x0204:                        # LABEL (BIFF8 rare)
                r, c, _xf = struct.unpack_from("<HHH", data, 0)
                s, _p = _xl_unicode(data, 6)
                cells[(r, c)] = s
        if not cells:
            continue
        n_rows = min(max(r for r, _ in cells) + 1, max_rows + 1)
        n_cols = max(c for _, c in cells) + 1
        rows = [[cells.get((r, c), "") for c in range(n_cols)]
                for r in range(n_rows)]
        render = rows if include_headers else rows[1:]
        if not render or (len(rows) == 1 and include_headers
                          and not any(rows[0])):
            continue
        out.append(f"Sheet: {name}")
        out.append(_format_table_rows(render))
        out.append("")
    return "\n".join(out)


def doc_metadata(payload) -> dict:
    """Lightweight .doc metadata: contained stream names + extracted
    text statistics (the reference's .doc branch reports only that
    metadata extraction is unsupported — word_processor.py:210-214;
    we do one better with what the container itself gives)."""
    streams = cfb_streams(payload)
    out = {"format": "doc", "stream_names": sorted(streams)}
    try:
        text = parse_doc(payload)
        out["character_count"] = len(text)
        out["paragraph_count"] = sum(1 for ln in text.split("\n")
                                     if ln.strip())
    except (ValueError, NotImplementedError) as e:
        out["text_error"] = str(e)
    return out


def xls_metadata(payload) -> dict:
    """Sheet inventory from the BOUNDSHEET records."""
    streams = cfb_streams(payload)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError("OLE file has no Workbook stream (not .xls)")
    names = []
    for op, data, _ in _biff_records(wb):
        if op == 0x0085:
            cch = data[6]
            grbit = data[7]
            if grbit & 0x01:
                names.append(data[8:8 + 2 * cch]
                             .decode("utf-16le", "replace"))
            else:
                names.append(data[8:8 + cch].decode("latin-1"))
    return {"format": "xls", "sheet_names": names,
            "sheet_count": len(names)}


def make_xls(sheets: Dict[str, List[List[str]]]) -> bytes:
    """Minimal BIFF8 workbook: globals (BOF, BOUNDSHEETs, SST, EOF)
    followed by per-sheet substreams (BOF, LABELSST/NUMBER cells, EOF).
    Numeric-looking cells become NUMBER records, the rest SST strings."""
    def rec(op: int, data: bytes) -> bytes:
        return struct.pack("<HH", op, len(data)) + data

    def bof(dt: int) -> bytes:
        return rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB,
                                       0x07CC, 0, 0))

    strings: List[str] = []
    lookup: Dict[str, int] = {}
    n_refs = 0
    sheet_cells = []
    for rows in sheets.values():
        cells = []
        for r, row in enumerate(rows):
            for c, val in enumerate(row):
                try:
                    cells.append((r, c, float(val), None))
                except (TypeError, ValueError):
                    if val not in lookup:
                        lookup[val] = len(strings)
                        strings.append(val)
                    n_refs += 1
                    cells.append((r, c, None, lookup[val]))
        sheet_cells.append(cells)

    sst_body = struct.pack("<II", n_refs, len(strings))
    for s in strings:
        raw = s.encode("utf-16le")
        sst_body += struct.pack("<HB", len(s), 0x01) + raw
    sst = rec(0x00FC, sst_body)

    sheet_streams = []
    for cells in sheet_cells:
        body = bof(0x0010)                            # worksheet
        for r, c, num, sidx in cells:
            if num is not None:
                body += rec(0x0203, struct.pack("<HHH", r, c, 0)
                            + struct.pack("<d", num))
            else:
                body += rec(0x00FD, struct.pack("<HHHI", r, c, 0, sidx))
        body += rec(0x000A, b"")
        sheet_streams.append(body)

    # globals with BOUNDSHEET offsets: compute after sizing globals
    names = list(sheets)

    def boundsheet(name: str, pos: int) -> bytes:
        raw = name.encode("utf-16le")
        return rec(0x0085, struct.pack("<IHBB", pos, 0, len(name), 0x01)
                   + raw)

    # two passes: BOUNDSHEET size depends only on names
    fixed = bof(0x0005) + sst
    bs_size = sum(4 + 8 + 2 * len(n) for n in names)
    globals_size = len(fixed) + bs_size + 4           # + EOF
    offs = []
    pos = globals_size
    for ss in sheet_streams:
        offs.append(pos)
        pos += len(ss)
    wb = (bof(0x0005) + sst
          + b"".join(boundsheet(n, o) for n, o in zip(names, offs))
          + rec(0x000A, b"") + b"".join(sheet_streams))
    return make_cfb({"Workbook": wb})
