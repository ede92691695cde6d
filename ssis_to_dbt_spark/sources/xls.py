"""Dependency-free legacy binary ``.xls`` (BIFF8) reader + minimal writer.

The reference declares ExcelSource without restricting it to ``.xlsx``
(/root/reference/src/parser/constants.py:37), so a migrating user can hold
legacy ``.xls`` workbooks.  Both layers of the format are publicly
documented and implemented here from those specs:

- **MS-CFB** (Compound File Binary): a little FAT filesystem in a file —
  512-byte sectors, a FAT mapping sector chains, a directory of streams,
  and a 64-byte-sector "mini stream" (held inside the root entry's chain)
  for streams under 4096 bytes.
- **MS-XLS** (BIFF8): the ``Workbook`` stream is a sequence of
  ``[type:u16][len:u16][payload]`` records — a globals substream (BOF,
  SST shared strings, BOUNDSHEET sheet registry) followed by one
  substream per sheet (BOF .. cell records .. EOF).

Scope: cell VALUES only (LABELSST/LABEL/NUMBER/RK/MULRK/BOOLERR), which is
Excel's actual role in the reference (small dimension/report sheets).
Formula results, 1904 dates, and encrypted workbooks fail loudly.  Like the
``.xlsx`` path (readers.py:read_xlsx_rows) this parses DRIVER-SIDE by
design; at scale the sheet is staged to parquet out-of-band.
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_NOSTREAM = 0xFFFFFFFF


# ---------------------------------------------------------------------------
# MS-CFB container
# ---------------------------------------------------------------------------


def _cfb_open_stream(data: bytes, wanted_names: tuple[str, ...]) -> bytes:
    """Extract the first directory stream whose name matches ``wanted_names``
    (case-insensitive) from a CFB container."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2/CFB file (bad magic) — is this a real .xls?")
    sector_shift = struct.unpack_from("<H", data, 30)[0]
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    sec_size, mini_size = 1 << sector_shift, 1 << mini_shift
    first_dir = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    first_minifat = struct.unpack_from("<I", data, 60)[0]
    n_minifat = struct.unpack_from("<I", data, 64)[0]
    first_difat = struct.unpack_from("<I", data, 68)[0]

    def sector(i: int) -> bytes:
        off = (i + 1) * sec_size
        return data[off : off + sec_size]

    # FAT sector list: 109 header DIFAT slots, then chained DIFAT sectors
    fat_sectors = [
        s
        for s in struct.unpack_from("<109I", data, 76)
        if s not in (_FREESECT, _ENDOFCHAIN)
    ]
    difat = first_difat
    while difat not in (_FREESECT, _ENDOFCHAIN):
        ent = struct.unpack_from(f"<{sec_size // 4}I", sector(difat))
        fat_sectors.extend(
            s for s in ent[:-1] if s not in (_FREESECT, _ENDOFCHAIN)
        )
        difat = ent[-1]
    fat: list[int] = []
    for s in fat_sectors:
        fat.extend(struct.unpack_from(f"<{sec_size // 4}I", sector(s)))

    def chain(start: int, table: list[int]) -> list[int]:
        out, cur, guard = [], start, 0
        while cur != _ENDOFCHAIN:
            if cur >= len(table) or guard > len(table):
                raise ValueError("corrupt CFB sector chain")
            out.append(cur)
            cur = table[cur]
            guard += 1
        return out

    directory = b"".join(sector(s) for s in chain(first_dir, fat))

    root_start = root_size = None
    target_start = target_size = None
    for off in range(0, len(directory), 128):
        entry = directory[off : off + 128]
        if len(entry) < 128:
            break
        name_len = struct.unpack_from("<H", entry, 64)[0]
        obj_type = entry[66]
        if obj_type == 0 or name_len < 2:
            continue
        name = entry[: name_len - 2].decode("utf-16-le", errors="replace")
        start = struct.unpack_from("<I", entry, 116)[0]
        size = struct.unpack_from("<Q", entry, 120)[0]
        if obj_type == 5:  # root storage holds the mini stream
            root_start, root_size = start, size
        elif obj_type == 2 and name.lower() in wanted_names:
            if target_start is None:
                target_start, target_size = start, size
    if target_start is None:
        raise ValueError(f"no {'/'.join(wanted_names)} stream in CFB directory")

    if target_size >= mini_cutoff:
        raw = b"".join(sector(s) for s in chain(target_start, fat))
        return raw[:target_size]

    # mini-stream path: miniFAT chains 64-byte sectors inside the root chain
    minifat: list[int] = []
    if n_minifat and first_minifat not in (_FREESECT, _ENDOFCHAIN):
        for s in chain(first_minifat, fat):
            minifat.extend(struct.unpack_from(f"<{sec_size // 4}I", sector(s)))
    mini_container = b"".join(sector(s) for s in chain(root_start, fat))[
        :root_size
    ]
    raw = b"".join(
        mini_container[s * mini_size : (s + 1) * mini_size]
        for s in chain(target_start, minifat)
    )
    return raw[:target_size]


# ---------------------------------------------------------------------------
# BIFF8 records
# ---------------------------------------------------------------------------

_R_BOF = 0x0809
_R_EOF = 0x000A
_R_SST = 0x00FC
_R_CONTINUE = 0x003C
_R_BOUNDSHEET = 0x0085
_R_LABELSST = 0x00FD
_R_LABEL = 0x0204
_R_NUMBER = 0x0203
_R_RK = 0x027E
_R_MULRK = 0x00BD
_R_BOOLERR = 0x0205
_R_FORMULA = 0x0006
_R_FILEPASS = 0x002F


def _records(stream: bytes):
    """Yield (type, payload_offset, payload_len, record_start) tuples."""
    pos = 0
    while pos + 4 <= len(stream):
        rtype, rlen = struct.unpack_from("<HH", stream, pos)
        yield rtype, pos + 4, rlen, pos
        pos += 4 + rlen


def _read_unicode_string(buf: bytes, pos: int, cch: int, grbit: int):
    """XLUnicodeString character data (rich/ext runs skipped by caller)."""
    if grbit & 0x01:  # 16-bit characters
        s = buf[pos : pos + 2 * cch].decode("utf-16-le")
        return s, pos + 2 * cch
    s = buf[pos : pos + cch].decode("latin-1")
    return s, pos + cch


def _parse_sst(stream: bytes, first: tuple[int, int]) -> list[str]:
    """Parse the SST record plus its CONTINUE records.

    Strings may span a record boundary; at each crossing the CONTINUE's
    first payload byte restates the compression flag for the remainder
    (the one genuinely tricky rule in BIFF8).
    """
    segs: list[tuple[int, int]] = [first]
    seg_iter = _records(stream)
    collecting = False
    for rtype, off, rlen, rstart in seg_iter:
        if rstart == first[0] - 4:
            collecting = True
            continue
        if not collecting:
            continue
        if rtype == _R_CONTINUE:
            segs.append((off, rlen))
        else:
            break

    si, pos = 0, segs[0][0]

    def remaining() -> int:
        return segs[si][0] + segs[si][1] - pos

    def advance_segment() -> None:
        nonlocal si, pos
        si += 1
        if si >= len(segs):
            raise ValueError("SST truncated: ran past last CONTINUE record")
        pos = segs[si][0]

    def read_exact(n: int) -> bytes:
        nonlocal pos
        out = b""
        while n > 0:
            if remaining() == 0:
                advance_segment()
            take = min(n, remaining())
            out += stream[pos : pos + take]
            pos += take
            n -= take
        return out

    cst_unique = struct.unpack("<I", read_exact(8)[4:8])[0]
    strings: list[str] = []
    for _ in range(cst_unique):
        if remaining() == 0:
            advance_segment()
        cch = struct.unpack("<H", read_exact(2))[0]
        grbit = read_exact(1)[0]
        n_runs = struct.unpack("<H", read_exact(2))[0] if grbit & 0x08 else 0
        cb_ext = struct.unpack("<I", read_exact(4))[0] if grbit & 0x04 else 0
        chars: list[str] = []
        todo = cch
        while todo > 0:
            if remaining() == 0:
                advance_segment()
                grbit = read_exact(1)[0]  # continuation restates compression
            if grbit & 0x01:
                take = min(todo, remaining() // 2)
                if take == 0:
                    raise ValueError("SST: 16-bit char split across records")
                chars.append(read_exact(2 * take).decode("utf-16-le"))
            else:
                take = min(todo, remaining())
                chars.append(read_exact(take).decode("latin-1"))
            todo -= take
        read_exact(4 * n_runs + cb_ext)  # skip rich/ext payloads
        strings.append("".join(chars))
    return strings


def _rk_value(rk: int) -> float:
    if rk & 0x02:
        val = float(struct.unpack("<i", struct.pack("<I", rk))[0] >> 2)
    else:
        val = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return val / 100.0 if rk & 0x01 else val


def _fmt_number(v: float) -> str:
    """Render a BIFF float the way the .xlsx cell XML renders it (integral
    values without a trailing .0), so schema casts behave identically."""
    return str(int(v)) if v == int(v) and abs(v) < 1e15 else repr(v)


def read_xls_rows(path: str, sheet: str | None = None) -> list[list]:
    """Read the cell grid of ``sheet`` (default: first sheet) from a legacy
    BIFF8 ``.xls`` workbook as strings/None — the ``.xls`` counterpart of
    ``readers.read_xlsx_rows``."""
    with open(path, "rb") as f:
        data = f.read()
    stream = _cfb_open_stream(data, ("workbook", "book"))

    sheets: list[tuple[str, int]] = []  # (name, stream offset of sheet BOF)
    sst: list[str] = []
    for rtype, off, rlen, _rstart in _records(stream):
        if rtype == _R_FILEPASS:
            raise NotImplementedError("encrypted .xls workbooks are unsupported")
        if rtype == _R_BOUNDSHEET:
            pos = struct.unpack_from("<I", stream, off)[0]
            cch = stream[off + 6]
            name, _ = _read_unicode_string(stream, off + 8, cch, stream[off + 7])
            sheets.append((name, pos))
        elif rtype == _R_SST:
            sst = _parse_sst(stream, (off, rlen))
        elif rtype == _R_EOF:
            break  # end of globals substream
    if not sheets:
        raise ValueError(f"no BOUNDSHEET records in {path}")
    if sheet is not None:
        sheets = [s for s in sheets if s[0] == sheet]
        if not sheets:
            raise ValueError(f"sheet {sheet!r} not found in {path}")

    cells: dict[tuple[int, int], str | None] = {}
    start = sheets[0][1]
    for rtype, off, rlen, rstart in _records(stream[start:]):
        if rstart > 0 and rtype == _R_BOF:
            break  # ran into the next sheet's substream
        if rtype == _R_EOF and rstart > 0:
            break
        if rtype == _R_LABELSST:
            rw, col, _ixfe, isst = struct.unpack_from("<HHHI", stream, start + off)
            cells[(rw, col)] = sst[isst]
        elif rtype == _R_LABEL:
            rw, col, _ixfe, cch = struct.unpack_from("<HHHH", stream, start + off)
            grbit = stream[start + off + 8]
            cells[(rw, col)], _ = _read_unicode_string(
                stream, start + off + 9, cch, grbit
            )
        elif rtype == _R_NUMBER:
            rw, col, _ixfe = struct.unpack_from("<HHH", stream, start + off)
            v = struct.unpack_from("<d", stream, start + off + 6)[0]
            cells[(rw, col)] = _fmt_number(v)
        elif rtype == _R_RK:
            rw, col, _ixfe, rk = struct.unpack_from("<HHHI", stream, start + off)
            cells[(rw, col)] = _fmt_number(_rk_value(rk))
        elif rtype == _R_MULRK:
            rw, col_first = struct.unpack_from("<HH", stream, start + off)
            n = (rlen - 6) // 6
            for i in range(n):
                rk = struct.unpack_from("<I", stream, start + off + 4 + 6 * i + 2)[0]
                cells[(rw, col_first + i)] = _fmt_number(_rk_value(rk))
        elif rtype == _R_BOOLERR:
            rw, col, _ixfe, val, is_err = struct.unpack_from(
                "<HHHBB", stream, start + off
            )
            cells[(rw, col)] = None if is_err else ("TRUE" if val else "FALSE")
        elif rtype == _R_FORMULA:
            raise NotImplementedError(
                "formula cells in .xls are unsupported; paste values or "
                "export to .xlsx/CSV"
            )
    if not cells:
        return []
    n_rows = max(r for r, _ in cells) + 1
    n_cols = max(c for _, c in cells) + 1
    return [
        [cells.get((r, c)) for c in range(n_cols)] for r in range(n_rows)
    ]


# ---------------------------------------------------------------------------
# Minimal BIFF8 writer (round-trip evidence for the reader)
# ---------------------------------------------------------------------------


def _rec(rtype: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rtype, len(payload)) + payload


def _biff_workbook(header: list[str], rows: list[list], sheet: str) -> bytes:
    """Assemble a single-sheet BIFF8 Workbook stream: globals (BOF,
    BOUNDSHEET, SST, EOF) then the worksheet substream (strings as
    LABELSST, numbers as NUMBER)."""
    strings: list[str] = []
    index: dict[str, int] = {}
    grid = [header] + rows

    def sst_idx(s: str) -> int:
        if s not in index:
            index[s] = len(strings)
            strings.append(s)
        return index[s]

    sheet_cells = []
    n_refs = 0
    for r, row in enumerate(grid):
        for c, v in enumerate(row):
            if v is None:
                continue
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                sheet_cells.append(
                    _rec(_R_NUMBER, struct.pack("<HHHd", r, c, 0, float(v)))
                )
            else:
                n_refs += 1
                sheet_cells.append(
                    _rec(
                        _R_LABELSST,
                        struct.pack("<HHHI", r, c, 0, sst_idx(str(v))),
                    )
                )

    sst_payload = struct.pack("<II", n_refs, len(strings))
    for s in strings:
        try:
            enc, grbit = s.encode("latin-1"), 0  # compressed 8-bit
        except UnicodeEncodeError:
            enc, grbit = s.encode("utf-16-le"), 1  # 16-bit characters
        sst_payload += struct.pack("<HB", len(s), grbit) + enc
    if len(sst_payload) > 8000:
        raise ValueError(
            "write_xls: SST would need CONTINUE records; stage large sheets "
            "as .xlsx or CSV instead"
        )

    bof = struct.pack("<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0x0600)
    sheet_bof = struct.pack("<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0x0600)
    name = sheet.encode("latin-1", errors="replace")
    boundsheet = struct.pack("<IHBB", 0, 0, len(name), 0) + name

    globals_part = (
        _rec(_R_BOF, bof)
        + _rec(_R_BOUNDSHEET, boundsheet)
        + _rec(_R_SST, sst_payload)
        + _rec(_R_EOF, b"")
    )
    sheet_part = _rec(_R_BOF, sheet_bof) + b"".join(sheet_cells) + _rec(_R_EOF, b"")
    # fix up BOUNDSHEET.lbPlyPos now that the globals length is known
    stream = globals_part + sheet_part
    bs_off = len(_rec(_R_BOF, bof)) + 4  # payload start of BOUNDSHEET
    return (
        stream[:bs_off]
        + struct.pack("<I", len(globals_part))
        + stream[bs_off + 4 :]
    )


def _cfb_container(stream: bytes) -> bytes:
    """Wrap one 'Workbook' stream in a minimal MS-CFB container.  Streams
    under 4096 bytes go through the mini stream + miniFAT (the layout real
    small .xls files use); larger ones get a regular FAT chain."""
    sec, mini = 512, 64

    def pad(b: bytes, n: int) -> bytes:
        return b + b"\x00" * (-len(b) % n)

    def dir_entry(name: str, obj_type: int, start: int, size: int,
                  child: int = _NOSTREAM) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        e = raw.ljust(64, b"\x00")
        e += struct.pack("<HBB", len(raw), obj_type, 1)  # black node
        e += struct.pack("<III", _NOSTREAM, _NOSTREAM, child)
        e += b"\x00" * 16 + b"\x00" * 4 + b"\x00" * 16  # clsid, state, times
        e += struct.pack("<IQ", start, size)
        return e

    use_mini = len(stream) < 4096
    if use_mini:
        mini_data = pad(stream, mini)
        n_mini = len(mini_data) // mini
        minifat = list(range(1, n_mini)) + [_ENDOFCHAIN]
        minifat_sec = pad(
            b"".join(struct.pack("<I", x) for x in minifat), sec
        )
        container = pad(mini_data, sec)
        n_cont = len(container) // sec
        # sector layout: 0=FAT, 1=directory, 2=miniFAT, 3..=mini container
        fat = [0xFFFFFFFD, _ENDOFCHAIN, _ENDOFCHAIN]
        fat += [3 + i + 1 for i in range(n_cont - 1)] + [_ENDOFCHAIN]
        fat_raw = b"".join(struct.pack("<I", x) for x in fat)
        fat_sec = fat_raw.ljust(sec, b"\xff")  # unused entries = FREESECT
        directory = pad(
            dir_entry("Root Entry", 5, 3, len(mini_data), child=1)
            + dir_entry("Workbook", 2, 0, len(stream)),
            sec,
        )
        body = fat_sec + directory + minifat_sec + container
        first_minifat, n_minifat = 2, 1
    else:
        data = pad(stream, sec)
        n_data = len(data) // sec
        # sector layout: 0=FAT(s), then directory, then workbook chain
        n_fat = 1
        while (n_fat * (sec // 4)) < (n_fat + 1 + n_data):
            n_fat += 1
        dir_sec_idx = n_fat
        first_data = n_fat + 1
        fat = [0xFFFFFFFD] * n_fat + [_ENDOFCHAIN]
        fat += [first_data + i + 1 for i in range(n_data - 1)] + [_ENDOFCHAIN]
        fat_raw = b"".join(struct.pack("<I", x) for x in fat)
        fat_raw = fat_raw.ljust(n_fat * sec, b"\xff")
        directory = pad(
            dir_entry("Root Entry", 5, _ENDOFCHAIN, 0, child=1)
            + dir_entry("Workbook", 2, first_data, len(stream)),
            sec,
        )
        body = fat_raw + directory + data
        first_minifat, n_minifat = _ENDOFCHAIN, 0
        dir_start = dir_sec_idx

    header = bytearray(512)
    header[0:8] = _CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 0x0003)  # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)  # 64-byte mini sectors
    struct.pack_into("<I", header, 44, 1 if use_mini else n_fat)
    struct.pack_into("<I", header, 48, 1 if use_mini else dir_start)
    struct.pack_into("<I", header, 56, 4096)
    struct.pack_into("<I", header, 60, first_minifat)
    struct.pack_into("<I", header, 64, n_minifat)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no extra DIFAT
    struct.pack_into("<I", header, 72, 0)
    difat = ([0] if use_mini else list(range(n_fat))) + [_FREESECT] * 108
    struct.pack_into("<109I", header, 76, *difat[:109])
    return bytes(header) + body


def write_xls(
    header: list[str], rows: list[list], path: str, sheet: str = "Sheet1"
) -> None:
    """Write a minimal single-sheet BIFF8 ``.xls`` — the legacy counterpart
    of ``writers.write_xlsx``, used to round-trip-prove ``read_xls_rows``."""
    stream = _biff_workbook(header, rows, sheet)
    with open(path, "wb") as f:
        f.write(_cfb_container(stream))
