"""Minimal legacy ``.xls`` (OLE2/CFB + BIFF8) reader — pure stdlib.

The reference accepts legacy binary workbooks through pandas/xlrd in
``read_csv_or_excel_to_df`` (src/schema_validata.py:862-953, extension
dispatch ~:899).  This engine previously rejected them with a
conversion hint; this module upgrades that to a real reader for the
BIFF8 subset that covers data-dictionary workbooks:

* OLE2 compound file: FAT chains, the mini FAT / mini stream (small
  workbooks live there), directory walk for the ``Workbook``/``Book``
  stream.
* BIFF8 records: BOF/EOF, BOUNDSHEET, SST (+CONTINUE, including
  strings split across record boundaries with re-emitted flag bytes),
  LABELSST, LABEL, NUMBER, RK, MULRK, BOOLERR, FORMULA cached results
  (+STRING), BLANK/MULBLANK.

* XF + FORMAT records (round 4): cells whose XF carries a built-in
  date ifmt (14-22/27-36/45-47/50-58) or a custom format string with
  date tokens come back as ``datetime.datetime`` (pure sub-day
  fractions as ``datetime.time``) — the reference's pandas/xlrd
  behavior (src/schema_validata.py:862-953); see ``_xl_serial_to_dt``
  for the 1900-leap-bug handling.

Deliberate scope limits (documented, not silent):

* BIFF5/BIFF7 (pre-Excel-97) substreams raise a clear error.
* Encrypted (FILEPASS) workbooks raise a clear error.
* The 1904 date system (DATEMODE record, classic-Mac workbooks) is
  honored: serials convert from the 1904-01-01 base, no leap bug.

Return contract matches ``read_xlsx``: ``{sheet_name: rows}`` in
workbook order, rows padded with None, trailing all-None rows dropped,
so every existing consumer (data-dictionary loader, spreadsheet
ingest) works unchanged.
"""

from __future__ import annotations

import struct

OLE2_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC


class XlsFormatError(ValueError):
    """Raised when bytes are not a readable BIFF8 workbook."""


# ---------------------------------------------------------------- OLE2


def _read_chain(data: bytes, fat: list[int], start: int,
                sector_size: int, base: int) -> bytes:
    """Concatenate a FAT (or mini FAT) chain starting at ``start``."""
    out = bytearray()
    sect = start
    seen = 0
    limit = len(fat) + 2
    while sect not in (_ENDOFCHAIN, _FREESECT):
        if sect >= len(fat) or seen > limit:
            raise XlsFormatError("corrupt OLE2 sector chain")
        off = base + sect * sector_size
        out += data[off:off + sector_size]
        sect = fat[sect]
        seen += 1
    return bytes(out)


def _u32s(buf: bytes) -> list[int]:
    return list(struct.unpack(f"<{len(buf) // 4}I", buf[:len(buf) // 4 * 4]))


def ole2_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Extract the first directory stream whose name is in ``names``
    from an OLE2 compound file (handles FAT, DIFAT and mini FAT)."""
    if data[:8] != OLE2_MAGIC:
        raise XlsFormatError("not an OLE2 compound file")
    if len(data) < 512 + 128:
        raise XlsFormatError(
            "truncated OLE2 file — not a readable .xls workbook")
    sector_shift = struct.unpack_from("<H", data, 30)[0]
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    sector_size = 1 << sector_shift
    mini_size = 1 << mini_shift
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<I", data, 60)[0]
    difat_start = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]
    base = 512  # sector 0 begins right after the 512-byte header

    # DIFAT: 109 header entries, then chained DIFAT sectors
    difat = _u32s(data[76:76 + 109 * 4])
    sect = difat_start
    for _ in range(n_difat):
        if sect in (_ENDOFCHAIN, _FREESECT):
            break
        off = base + sect * sector_size
        block = data[off:off + sector_size]
        difat += _u32s(block[:-4])
        sect = struct.unpack_from("<I", block, sector_size - 4)[0]
    fat_sectors = [s for s in difat if s not in
                   (_FREESECT, _ENDOFCHAIN, _FATSECT, _DIFSECT)][:n_fat]
    fat: list[int] = []
    for s in fat_sectors:
        off = base + s * sector_size
        fat += _u32s(data[off:off + sector_size])

    directory = _read_chain(data, fat, dir_start, sector_size, base)

    root_start = root_size = None
    target_start = target_size = None
    for off in range(0, len(directory) - 127, 128):
        entry = directory[off:off + 128]
        name_len = struct.unpack_from("<H", entry, 64)[0]
        if name_len < 2:
            continue
        name = entry[:name_len - 2].decode("utf-16-le", "replace")
        etype = entry[66]
        start = struct.unpack_from("<I", entry, 116)[0]
        size = struct.unpack_from("<Q", entry, 120)[0]
        if etype == 5:  # root storage — owns the mini stream
            root_start, root_size = start, size
        elif etype == 2 and name in names and target_start is None:
            target_start, target_size = start, size
    if target_start is None:
        raise XlsFormatError(
            f"OLE2 file has no {'/'.join(names)} stream")

    if target_size >= mini_cutoff:
        return _read_chain(data, fat, target_start,
                           sector_size, base)[:target_size]

    # small stream: walk the mini FAT over the root's mini stream
    if root_start is None:
        raise XlsFormatError("OLE2 mini stream without a root entry")
    mini_container = _read_chain(data, fat, root_start,
                                 sector_size, base)[:root_size]
    minifat = _u32s(_read_chain(data, fat, minifat_start,
                                sector_size, base))
    out = bytearray()
    sect = target_start
    seen = 0
    while sect not in (_ENDOFCHAIN, _FREESECT):
        if sect >= len(minifat) or seen > len(minifat) + 2:
            raise XlsFormatError("corrupt OLE2 mini-FAT chain")
        off = sect * mini_size
        out += mini_container[off:off + mini_size]
        sect = minifat[sect]
        seen += 1
    return bytes(out[:target_size])


# ---------------------------------------------------------------- BIFF8

_BOF = 0x0809
_EOF = 0x000A
_BOUNDSHEET = 0x0085
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207
_BLANK = 0x0201
_MULBLANK = 0x00BE
_FILEPASS = 0x002F
_XF = 0x00E0
_FORMAT = 0x041E
_DATEMODE = 0x0022

# Built-in number-format ids Excel renders as dates/times (the same
# ranges xlrd's is_date_format_string/builtin tables use): 14-22
# date+time, 27-36 East-Asian dates, 45-47 elapsed/time, 50-58 more
# East-Asian date variants.
_BUILTIN_DATE_IFMTS = frozenset(
    list(range(14, 23)) + list(range(27, 37))
    + list(range(45, 48)) + list(range(50, 59)))


def _is_date_format_string(fmt: str) -> bool:
    """Heuristic shared with xlrd/openpyxl: after dropping quoted
    literals, [bracketed] sections, backslash escapes and the color/
    condition codes, any remaining y/m/d/h/s token means the format
    renders a date or time."""
    out = []
    i, n = 0, len(fmt)
    while i < n:
        ch = fmt[i]
        if ch == '"':                      # quoted literal
            j = fmt.find('"', i + 1)
            i = n if j < 0 else j + 1
        elif ch == "[":                    # [h]/[Red]/[$-409] section:
            j = fmt.find("]", i + 1)       # elapsed-time [h]/[mm]/[ss]
            body = fmt[i + 1:j] if j > 0 else ""
            # elapsed tokens are RUNS of one time letter ([h], [hh],
            # [mm], [ss]); color names ([Magenta], [Red]) and locale
            # codes ([$-409]) merely CONTAIN time letters and must not
            # date-tag the format (xlrd/openpyxl make the same cut)
            if body and set(body.lower()) <= set("hms"):
                out.append(body[0].lower())
            i = n if j < 0 else j + 1
        elif ch == "\\":
            i += 2
        else:
            out.append(ch)
            i += 1
    return any(c in "ymdhsYMDHS" for c in out)


def _xl_serial_to_dt(value, date1904: bool = False):
    """Excel date serial → datetime (or time for pure sub-day
    fractions). 1900 system: serial 60 is the phantom 1900-02-29 of
    the Lotus leap bug — clamped to 1900-02-28 (xlrd's datemode-0
    tuple is not a real datetime either); serials ≥ 61 use the
    standard 1899-12-30 base so modern dates are exact. 1904 system
    (DATEMODE 1): plain 1904-01-01 base, no leap bug. Sub-day
    fractions round to the nearest second (Excel stores a float;
    xlrd does the same)."""
    import datetime as _dt
    f = float(value)
    # Out-of-range serials (negative, or past year 9999 — e.g. a
    # yyyymmdd integer like 20250815 sitting in a date-formatted
    # column) stay NUMBERS: degrade per-cell like xlrd/pandas instead
    # of throwing OverflowError and killing the whole workbook read.
    # The 9999-12-31 serial is epoch-specific: the 1904 base sits
    # 1,462 days later, so its bound is 2,957,003 — using the 1900
    # bound there would let serials 2,957,004–2,958,465 overflow.
    if f < 0 or f > (2_957_003 if date1904 else 2_958_465):
        return value
    days = int(f)
    secs = round((f - days) * 86400)
    if secs >= 86400:
        days, secs = days + 1, secs - 86400
    if days == 0:
        return _dt.time(secs // 3600, (secs % 3600) // 60, secs % 60)
    if date1904:
        base = _dt.datetime(1904, 1, 1)
    elif days == 60:
        base, days = _dt.datetime(1899, 12, 31), 59
    elif days < 60:
        base = _dt.datetime(1899, 12, 31)
    else:
        base = _dt.datetime(1899, 12, 30)
    return base + _dt.timedelta(days=days, seconds=secs)


def _records(stream: bytes, pos: int = 0):
    """Yield (record_id, payload, offset) from a BIFF stream."""
    n = len(stream)
    while pos + 4 <= n:
        rid, ln = struct.unpack_from("<HH", stream, pos)
        payload = stream[pos + 4:pos + 4 + ln]
        yield rid, payload, pos
        pos += 4 + ln
        if rid == _EOF:
            return


class _ChunkReader:
    """Byte reader over an SST payload plus its CONTINUE payloads.

    BIFF8 strings may split across a record boundary; at the split the
    continuation re-emits a fresh *option-flags* byte, so the string
    decoder must ask the reader which chunk each run of characters came
    from.  ``read(n)`` never crosses a boundary silently — it returns
    at most the bytes left in the current chunk and exposes
    ``at_boundary`` so callers re-read flags."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.pos = 0

    def _skip_empty(self):
        while (self.ci < len(self.chunks)
               and self.pos >= len(self.chunks[self.ci])):
            self.ci += 1
            self.pos = 0

    def eof(self) -> bool:
        self._skip_empty()
        return self.ci >= len(self.chunks)

    def read(self, n: int) -> bytes:
        """Read up to n bytes without crossing a chunk boundary."""
        self._skip_empty()
        if self.eof():
            raise XlsFormatError("truncated SST")
        chunk = self.chunks[self.ci]
        take = min(n, len(chunk) - self.pos)
        out = chunk[self.pos:self.pos + take]
        self.pos += take
        return out

    def read_exact(self, n: int) -> bytes:
        """Read exactly n bytes, crossing boundaries (for fixed-width
        fields like counts, which may NOT re-emit flags)."""
        out = bytearray()
        while len(out) < n:
            out += self.read(n - len(out))
        return bytes(out)


def _read_xl_string(rd: _ChunkReader) -> str:
    """XLUnicodeRichExtendedString (used by SST)."""
    cch = struct.unpack("<H", rd.read_exact(2))[0]
    flags = rd.read_exact(1)[0]
    n_runs = 0
    cb_ext = 0
    if flags & 0x08:
        n_runs = struct.unpack("<H", rd.read_exact(2))[0]
    if flags & 0x04:
        cb_ext = struct.unpack("<I", rd.read_exact(4))[0]
    high = bool(flags & 0x01)
    parts: list[str] = []
    remaining = cch
    while remaining > 0:
        width = 2 if high else 1
        raw = rd.read(remaining * width)
        if width == 2 and len(raw) % 2:
            raw += rd.read_exact(1)  # char split across the boundary
        parts.append(raw.decode("utf-16-le" if high else "latin-1"))
        remaining -= len(raw) // width if width == 2 else len(raw)
        if remaining > 0:
            # crossed into a CONTINUE: a fresh flags byte precedes the
            # rest of the characters and may change the width
            high = bool(rd.read_exact(1)[0] & 0x01)
    rd.read_exact(n_runs * 4 + cb_ext)  # skip rich runs / ext data
    return "".join(parts)


def _read_short_string(buf: bytes, off: int) -> tuple[str, int]:
    """Inline XLUnicodeString with 16-bit length (LABEL / STRING)."""
    cch = struct.unpack_from("<H", buf, off)[0]
    flags = buf[off + 2]
    off += 3
    if flags & 0x01:
        return (buf[off:off + 2 * cch].decode("utf-16-le"),
                off + 2 * cch)
    return buf[off:off + cch].decode("latin-1"), off + cch


def _rk_value(rk: int) -> float | int:
    f_x100 = rk & 0x01
    f_int = rk & 0x02
    if f_int:
        v = rk >> 2
        if v & 0x20000000:  # sign-extend 30-bit
            v -= 0x40000000
        val: float | int = v
    else:
        val = struct.unpack("<d", struct.pack("<Q",
                                              (rk & ~0x3) << 32))[0]
    if f_x100:
        v2 = val / 100
        return int(v2) if float(v2).is_integer() else v2
    return val


def _num(v: float) -> float | int:
    """Collapse float-integral numerics to int, like the xlsx reader."""
    if isinstance(v, float) and v.is_integer() and abs(v) < 1e15:
        return int(v)
    return v


def read_xls(path_or_bytes) -> dict[str, list[list]]:
    """Read a BIFF8 ``.xls`` workbook → ``{sheet_name: rows}`` with the
    same shape contract as ``read_xlsx`` (None-padded rows, trailing
    blank rows dropped, workbook sheet order)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    stream = ole2_stream(data, ("Workbook", "Book"))

    # --- globals substream: BOF version, BOUNDSHEET list, SST,
    # FORMAT/XF records (date-cell detection — reference analog:
    # pandas/xlrd returns datetimes for date-formatted cells,
    # src/schema_validata.py:862-953)
    sheets: list[tuple[str, int]] = []   # (name, stream offset)
    sst: list[str] = []
    sst_chunks: list[bytes] = []
    in_sst = False
    n_sst = 0
    fmt_strings: dict[int, str] = {}     # custom number formats
    xf_ifmts: list[int] = []             # XF index → ifmt
    date1904 = False
    for rid, payload, off in _records(stream):
        if rid == _BOF and off == 0:
            vers = struct.unpack_from("<H", payload, 0)[0]
            if vers not in (0x0600,):  # BIFF8
                raise XlsFormatError(
                    f"unsupported BIFF version 0x{vers:04x} — only "
                    "BIFF8 (Excel 97+) .xls is readable; re-save the "
                    "workbook in a newer format")
        elif rid == _FILEPASS:
            raise XlsFormatError(
                "encrypted .xls workbook — remove the password and retry")
        elif rid == _BOUNDSHEET:
            pos = struct.unpack_from("<I", payload, 0)[0]
            cch = payload[6]
            flags = payload[7]
            if flags & 0x01:
                name = payload[8:8 + 2 * cch].decode("utf-16-le")
            else:
                name = payload[8:8 + cch].decode("latin-1")
            sheets.append((name, pos))
        elif rid == _FORMAT and len(payload) >= 5:
            ifmt = struct.unpack_from("<H", payload, 0)[0]
            cch = struct.unpack_from("<H", payload, 2)[0]
            grbit = payload[4]
            if grbit & 0x01:
                s = payload[5:5 + 2 * cch].decode("utf-16-le", "replace")
            else:
                s = payload[5:5 + cch].decode("latin-1")
            fmt_strings[ifmt] = s
        elif rid == _XF and len(payload) >= 4:
            xf_ifmts.append(struct.unpack_from("<H", payload, 2)[0])
        elif rid == _DATEMODE and len(payload) >= 2:
            date1904 = bool(struct.unpack_from("<H", payload, 0)[0])
        elif rid == _SST:
            in_sst = True
            n_sst = struct.unpack_from("<I", payload, 4)[0]
            sst_chunks = [payload[8:]]
        elif rid == _CONTINUE and in_sst:
            sst_chunks.append(payload)
        elif in_sst:
            in_sst = False
    if n_sst:
        rd = _ChunkReader(sst_chunks)
        for _ in range(n_sst):
            sst.append(_read_xl_string(rd))

    date_xfs = {
        i for i, ifmt in enumerate(xf_ifmts)
        if ifmt in _BUILTIN_DATE_IFMTS
        or (ifmt in fmt_strings
            and _is_date_format_string(fmt_strings[ifmt]))}

    def _maybe_dt(ixfe: int, value):
        if ixfe in date_xfs and isinstance(value, (int, float)) \
                and not isinstance(value, bool):
            return _xl_serial_to_dt(value, date1904)
        return value

    out: dict[str, list[list]] = {}
    for name, pos in sheets:
        cells: dict[tuple[int, int], object] = {}
        pending_formula: tuple[int, int] | None = None
        for rid, payload, _off in _records(stream, pos):
            if rid == _LABELSST:
                rw, col = struct.unpack_from("<HH", payload, 0)
                idx = struct.unpack_from("<I", payload, 6)[0]
                cells[(rw, col)] = sst[idx] if idx < len(sst) else None
            elif rid == _NUMBER:
                rw, col, ixfe = struct.unpack_from("<HHH", payload, 0)
                cells[(rw, col)] = _maybe_dt(ixfe, _num(
                    struct.unpack_from("<d", payload, 6)[0]))
            elif rid == _RK:
                rw, col, ixfe = struct.unpack_from("<HHH", payload, 0)
                cells[(rw, col)] = _maybe_dt(ixfe, _num(_rk_value(
                    struct.unpack_from("<I", payload, 6)[0])))
            elif rid == _MULRK:
                rw, col_first = struct.unpack_from("<HH", payload, 0)
                col_last = struct.unpack_from(
                    "<H", payload, len(payload) - 2)[0]
                for i in range(col_last - col_first + 1):
                    ixfe = struct.unpack_from("<H", payload, 4 + 6 * i)[0]
                    rk = struct.unpack_from("<I", payload, 4 + 6 * i + 2)[0]
                    cells[(rw, col_first + i)] = _maybe_dt(
                        ixfe, _num(_rk_value(rk)))
            elif rid == _LABEL:
                rw, col = struct.unpack_from("<HH", payload, 0)
                cells[(rw, col)] = _read_short_string(payload, 6)[0]
            elif rid == _BOOLERR:
                rw, col = struct.unpack_from("<HH", payload, 0)
                val, is_err = payload[6], payload[7]
                cells[(rw, col)] = None if is_err else bool(val)
            elif rid == _FORMULA:
                rw, col, ixfe = struct.unpack_from("<HHH", payload, 0)
                result = payload[6:14]
                if result[6:8] == b"\xff\xff":
                    kind = result[0]
                    if kind == 0:      # string — value in next STRING rec
                        pending_formula = (rw, col)
                    elif kind == 1:    # boolean
                        cells[(rw, col)] = bool(result[2])
                    elif kind == 3:    # empty string
                        cells[(rw, col)] = ""
                    # kind == 2: error → None (unset)
                else:
                    cells[(rw, col)] = _maybe_dt(ixfe, _num(
                        struct.unpack("<d", result)[0]))
            elif rid == _STRING and pending_formula is not None:
                cells[pending_formula] = _read_short_string(payload, 0)[0]
                pending_formula = None
            elif rid in (_BLANK, _MULBLANK):
                pass
        if cells:
            max_r = max(r for r, _ in cells)
            max_c = max(c for _, c in cells)
            rows = [[cells.get((r, c)) for c in range(max_c + 1)]
                    for r in range(max_r + 1)]
        else:
            rows = []
        while rows and all(v is None for v in rows[-1]):
            rows.pop()
        out[name] = rows
    return out


def read_xls_records(path: str) -> dict[str, list[dict]]:
    """{sheet: [row dicts]} with the xlsx reader's header contract
    (whitespace-trimmed names; headerless sheets come back empty)."""
    out = {}
    for name, rows in read_xls(path).items():
        if not rows:
            out[name] = []
            continue
        header = [str(h).strip() if h is not None else "" for h in rows[0]]
        out[name] = [
            {header[i]: row[i] for i in range(len(header)) if header[i]}
            for row in rows[1:]
        ]
    return out
