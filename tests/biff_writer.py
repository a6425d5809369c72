"""Test-support minimal BIFF8 ``.xls`` writer (stdlib only).

Produces real OLE2/CFB + BIFF8 bytes so the production reader
(schema_validata_spark/sources/xls.py) is exercised against an
independent encoder rather than fixture blobs.  Deliberately exercises
the fiddly corners: SST CONTINUE splits inside character data (with
re-emitted flag bytes), compressed vs UTF-16 strings, RK int/x100
encodings, MULRK runs, inline LABEL, BOOLERR, cached FORMULA results,
and both the mini-stream (<4096 bytes) and regular-FAT layouts.

NOT a production writer — the engine writes ``.xlsx`` via
sources/xlsx.py; legacy ``.xls`` is read-only surface.
"""

from __future__ import annotations

import struct

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD

_SECTOR = 512
_MINI = 64
_MINI_CUTOFF = 4096


# ---------------------------------------------------------------- BIFF


def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def _xl_string(s: str, compress: bool | None = None) -> bytes:
    """XLUnicodeRichExtendedString for SST."""
    if compress is None:
        compress = all(ord(c) < 256 for c in s)
    if compress:
        return struct.pack("<HB", len(s), 0x00) + s.encode("latin-1")
    return struct.pack("<HB", len(s), 0x01) + s.encode("utf-16-le")


def _sst_records(strings: list[str], total_refs: int,
                 max_payload: int = 8224,
                 force_split_at: int | None = None) -> bytes:
    """SST + CONTINUE records.  ``force_split_at`` caps the first
    record's payload to force a split inside character data, re-emitting
    the option-flags byte at the continuation per the BIFF8 spec."""
    blobs: list[bytes] = []
    header = struct.pack("<II", total_refs, len(strings))
    cur = bytearray(header)
    limit = force_split_at if force_split_at is not None else max_payload
    for s in strings:
        compress = all(ord(c) < 256 for c in s)
        width = 1 if compress else 2
        chars = s.encode("latin-1") if compress else s.encode("utf-16-le")
        head = struct.pack("<HB", len(s), 0x00 if compress else 0x01)
        if len(cur) + len(head) + len(chars) <= limit:
            cur += head + chars
            continue
        # split: header + as many whole chars as fit in this record
        room = limit - len(cur) - len(head)
        n_fit = max(0, (room // width))
        cur += head + chars[:n_fit * width]
        blobs.append(bytes(cur))
        # continuation starts with a fresh flags byte before the rest
        cur = bytearray(struct.pack("<B", 0x00 if compress else 0x01)
                        + chars[n_fit * width:])
        limit = max_payload
    blobs.append(bytes(cur))
    out = _rec(0x00FC, blobs[0])
    for b in blobs[1:]:
        out += _rec(0x003C, b)
    return out


def _rk_int(v: int, x100: bool = False) -> int:
    rk = (v & 0x3FFFFFFF) << 2
    rk |= 0x02
    if x100:
        rk |= 0x01
    return rk & 0xFFFFFFFF


# XF indexes the writer assigns for date-format tests: 16 built-in
# date (ifmt 14 m/d/yy), 17 custom datetime, 18 custom time-only.
_XF_DATE, _XF_DATETIME, _XF_TIME = 16, 17, 18
_CUSTOM_DT_IFMT, _CUSTOM_TIME_IFMT = 164, 165


def build_workbook_stream(sheets: dict[str, list[list]],
                          sst_split_at: int | None = None,
                          pad_to: int = 0,
                          date1904: bool = False) -> bytes:
    """BIFF8 Workbook stream: globals (BOF, DATEMODE, FORMAT/XF table,
    BOUNDSHEETs, SST, EOF) then one substream per sheet.  Strings
    become SST/LABELSST except those tagged ``("label", s)`` which use
    inline LABEL records.  Date cells: ``("date", serial)`` NUMBER with
    the built-in m/d/yy XF, ``("datetime", serial)`` NUMBER with a
    custom yyyy-mm-dd hh:mm:ss format, ``("time", serial)`` NUMBER
    with a custom hh:mm format, ``("date_rk", int_serial)`` RK with
    the date XF — exercising every numeric record kind the reader
    date-tags."""
    strings: list[str] = []
    str_idx: dict[str, int] = {}
    refs = 0
    for rows in sheets.values():
        for row in rows:
            for v in row:
                if isinstance(v, str):
                    refs += 1
                    if v not in str_idx:
                        str_idx[v] = len(strings)
                        strings.append(v)

    sheet_streams: list[bytes] = []
    for rows in sheets.values():
        body = bytearray(_rec(0x0809, struct.pack(
            "<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0x0600)))
        for r, row in enumerate(rows):
            c = 0
            while c < len(row):
                v = row[c]
                if v is None:
                    body += _rec(0x0201, struct.pack("<HHH", r, c, 15))
                    c += 1
                elif isinstance(v, tuple) and v[0] == "label":
                    s = v[1]
                    compress = all(ord(ch) < 256 for ch in s)
                    enc = (s.encode("latin-1") if compress
                           else s.encode("utf-16-le"))
                    body += _rec(0x0204, struct.pack(
                        "<HHHHB", r, c, 15, len(s),
                        0x00 if compress else 0x01) + enc)
                    c += 1
                elif isinstance(v, tuple) and v[0] in ("date", "datetime",
                                                       "time"):
                    xf = {"date": _XF_DATE, "datetime": _XF_DATETIME,
                          "time": _XF_TIME}[v[0]]
                    body += _rec(0x0203, struct.pack(
                        "<HHH", r, c, xf) + struct.pack("<d", float(v[1])))
                    c += 1
                elif isinstance(v, tuple) and v[0] == "date_rk":
                    body += _rec(0x027E, struct.pack(
                        "<HHHI", r, c, _XF_DATE, _rk_int(int(v[1]))))
                    c += 1
                elif isinstance(v, tuple) and v[0] == "formula_num":
                    body += _rec(0x0006, struct.pack(
                        "<HHH", r, c, 15) + struct.pack("<d", v[1])
                        + struct.pack("<HIH", 0, 0, 0))
                    c += 1
                elif isinstance(v, tuple) and v[0] == "formula_str":
                    body += _rec(0x0006, struct.pack("<HHH", r, c, 15)
                                 + b"\x00\x00\x00\x00\x00\x00\xff\xff"
                                 + struct.pack("<HIH", 0, 0, 0))
                    s = v[1]
                    body += _rec(0x0207, struct.pack(
                        "<HB", len(s), 0x00) + s.encode("latin-1"))
                    c += 1
                elif isinstance(v, str):
                    body += _rec(0x00FD, struct.pack(
                        "<HHHI", r, c, 15, str_idx[v]))
                    c += 1
                elif isinstance(v, bool):
                    body += _rec(0x0205, struct.pack(
                        "<HHHBB", r, c, 15, int(v), 0))
                    c += 1
                elif isinstance(v, int) and -(2 ** 29) <= v < 2 ** 29:
                    # runs of small ints → MULRK to exercise that path
                    run = [v]
                    while (c + len(run) < len(row)
                           and isinstance(row[c + len(run)], int)
                           and not isinstance(row[c + len(run)], bool)
                           and -(2 ** 29) <= row[c + len(run)] < 2 ** 29):
                        run.append(row[c + len(run)])
                    if len(run) >= 2:
                        payload = struct.pack("<HH", r, c)
                        for rv in run:
                            payload += struct.pack("<HI", 15, _rk_int(rv))
                        payload += struct.pack("<H", c + len(run) - 1)
                        body += _rec(0x00BD, payload)
                        c += len(run)
                    else:
                        body += _rec(0x027E, struct.pack(
                            "<HHHI", r, c, 15, _rk_int(v)))
                        c += 1
                elif isinstance(v, float) and (v * 100).is_integer() \
                        and -(2 ** 29) <= v * 100 < 2 ** 29:
                    body += _rec(0x027E, struct.pack(
                        "<HHHI", r, c, 15, _rk_int(int(v * 100), True)))
                    c += 1
                else:
                    body += _rec(0x0203, struct.pack(
                        "<HHH", r, c, 15) + struct.pack("<d", float(v)))
                    c += 1
        body += _rec(0x000A, b"")
        sheet_streams.append(bytes(body))

    # globals, two-pass for BOUNDSHEET offsets
    def globals_blob(offsets: list[int]) -> bytes:
        g = bytearray(_rec(0x0809, struct.pack(
            "<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0x0600)))
        g += _rec(0x0022, struct.pack("<H", 1 if date1904 else 0))
        for ifmt, fmt in ((_CUSTOM_DT_IFMT, "yyyy-mm-dd hh:mm:ss"),
                          (_CUSTOM_TIME_IFMT, 'hh:mm"h"')):
            enc = fmt.encode("latin-1")
            g += _rec(0x041E, struct.pack("<HHB", ifmt, len(fmt), 0) + enc)
        # 16 default XFs (ifmt 0 General) so cell ixfe 15 stays
        # non-date, then the three date XFs at indexes 16/17/18
        for ifmt in [0] * 16 + [14, _CUSTOM_DT_IFMT, _CUSTOM_TIME_IFMT]:
            g += _rec(0x00E0, struct.pack("<HHH", 0, ifmt, 0x0001)
                      + b"\x00" * 14)
        for name, off in zip(sheets, offsets):
            enc = name.encode("latin-1")
            g += _rec(0x0085, struct.pack(
                "<IHBB", off, 0, len(name), 0x00) + enc)
        g += _sst_records(strings, refs, force_split_at=sst_split_at)
        g += _rec(0x000A, b"")
        return bytes(g)

    size = len(globals_blob([0] * len(sheets)))
    offsets = []
    pos = size
    for ss in sheet_streams:
        offsets.append(pos)
        pos += len(ss)
    stream = globals_blob(offsets) + b"".join(sheet_streams)
    if pad_to and len(stream) < pad_to:
        stream += _rec(0x005C, b"\x20" * min(112, pad_to))  # WRITEACCESS pad
        while len(stream) < pad_to:
            stream += _rec(0x005C, b"\x20" * 112)
    return stream


# ---------------------------------------------------------------- OLE2


def build_ole2(stream_name: str, stream: bytes) -> bytes:
    """Wrap one stream in a minimal OLE2/CFB container (512-byte
    sectors, one FAT sector).  Streams under 4096 bytes go through the
    mini FAT/mini stream, matching real Excel output for small files."""

    def n_sect(nbytes: int, size: int) -> int:
        return (nbytes + size - 1) // size

    use_mini = len(stream) < _MINI_CUTOFF
    sectors: list[bytes] = []
    fat: list[int] = []

    def add_chain(data: bytes) -> int:
        start = len(sectors)
        k = max(1, n_sect(len(data), _SECTOR))
        for i in range(k):
            sectors.append(data[i * _SECTOR:(i + 1) * _SECTOR]
                           .ljust(_SECTOR, b"\x00"))
            fat.append(len(sectors) if i < k - 1 else _ENDOFCHAIN)
        return start

    # sector 0 is the FAT itself
    sectors.append(b"")  # placeholder
    fat.append(_FATSECT)

    if use_mini:
        mini_n = max(1, n_sect(len(stream), _MINI))
        minifat = b"".join(
            struct.pack("<I", i + 1 if i < mini_n - 1 else _ENDOFCHAIN)
            for i in range(mini_n))
        minifat_start = add_chain(minifat)
        mini_container = stream  # workbook is the only mini stream
        mini_start_sect = add_chain(mini_container)
        wb_start, wb_size = 0, len(stream)  # minisector 0
        root_start, root_size = mini_start_sect, len(mini_container)
        n_minifat_sect = max(1, n_sect(len(minifat), _SECTOR))
    else:
        minifat_start = _ENDOFCHAIN
        n_minifat_sect = 0
        wb_start = add_chain(stream)
        wb_size = len(stream)
        root_start, root_size = _ENDOFCHAIN, 0

    def dirent(name: str, etype: int, start: int, size: int,
               child: int = 0xFFFFFFFF) -> bytes:
        enc = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[0:len(enc)] = enc
        struct.pack_into("<H", e, 64, len(enc))
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, 0xFFFFFFFF, 0xFFFFFFFF, child)
        struct.pack_into("<I", e, 116, start & 0xFFFFFFFF)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    directory = (dirent("Root Entry", 5,
                        root_start if use_mini else _ENDOFCHAIN,
                        root_size, child=1)
                 + dirent(stream_name, 2, wb_start, wb_size)
                 + b"\x00" * 256)
    dir_start = add_chain(directory)

    assert len(fat) <= _SECTOR // 4, "test writer: workbook too large"
    fat_blob = b"".join(struct.pack("<I", x) for x in fat)
    fat_blob = fat_blob.ljust(_SECTOR, b"\xff")
    sectors[0] = fat_blob

    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major (512-byte)
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<H", header, 30, 9)        # sector shift
    struct.pack_into("<H", header, 32, 6)        # mini shift
    struct.pack_into("<I", header, 44, 1)        # 1 FAT sector
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, _MINI_CUTOFF)
    struct.pack_into("<I", header, 60,
                     minifat_start if use_mini else _ENDOFCHAIN)
    struct.pack_into("<I", header, 64, n_minifat_sect)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    difat = [0] + [_FREESECT] * 108
    for i, v in enumerate(difat):
        struct.pack_into("<I", header, 76 + 4 * i, v)

    return bytes(header) + b"".join(sectors)


def write_xls(path: str, sheets: dict[str, list[list]],
              sst_split_at: int | None = None,
              force_big: bool = False, date1904: bool = False) -> None:
    stream = build_workbook_stream(
        sheets, sst_split_at=sst_split_at,
        pad_to=_MINI_CUTOFF + 512 if force_big else 0,
        date1904=date1904)
    with open(path, "wb") as f:
        f.write(build_ole2("Workbook", stream))
