"""Minimal XLSX (ECMA-376 SpreadsheetML) reader/writer on the stdlib.

The reference's rules are AUTHORED in XLSX (``data_dictionary_template
.xlsx``; ``xlsx_tabs_to_pd_dataframes`` src/schema_validata.py:706-776,
``data_dict_to_json`` :780-858) and its report sink writes XLSX
(``write_dataframes_to_xlsx`` :1546-1627). openpyxl is absent in this
environment, so this module implements the small subset of the OOXML
package format those operations need, using only ``zipfile`` +
``xml.etree``:

* reader: workbook sheet registry (+ relationship targets), shared
  strings, inline strings, numbers, booleans. Styled date cells are
  returned as their raw serial numbers (no style table interpretation —
  rule dictionaries carry strings/numbers; documented limitation).
* writer: inline-string cells (no shared-string table needed), numbers,
  booleans; one worksheet per sheet; Excel row chunking is handled by
  the caller (report.py) exactly like the reference (:1574-1620).

Everything here is driver-side small-data plumbing — rule tables and
human-facing report extracts — never the 10^12-row path.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"


def _col_index(cell_ref: str) -> int:
    """'B7' → 1 (0-based column index)."""
    idx = 0
    for ch in cell_ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return idx - 1


def _col_letters(idx: int) -> str:
    """0 → 'A', 27 → 'AB'."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _rich_text(el: ET.Element) -> str:
    """Concatenate the <t> runs of an <si>/<is> element, skipping
    phonetic-hint subtrees (<rPh> furigana carries duplicate text that
    is NOT part of the cell value — openpyxl excludes it too)."""
    parts: list[str] = []
    for child in el:
        tag = child.tag
        if tag == f"{{{_NS_MAIN}}}rPh":
            continue
        if tag == f"{{{_NS_MAIN}}}t":
            parts.append(child.text or "")
        else:  # <r> rich run (or future containers): take its <t>s
            parts.extend(t.text or ""
                         for t in child.iter(f"{{{_NS_MAIN}}}t"))
    return "".join(parts)


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    v_el = c.find(f"{{{_NS_MAIN}}}v")
    if t == "inlineStr":
        is_el = c.find(f"{{{_NS_MAIN}}}is")
        if is_el is None:
            return None
        return _rich_text(is_el) or None
    if v_el is None or v_el.text is None:
        return None
    raw = v_el.text
    if t == "s":
        return shared[int(raw)]
    if t == "b":
        return raw in ("1", "true")
    if t in ("str", "e"):
        return raw
    # numeric: int when whole, float otherwise ('1e400' → inf raises
    # OverflowError from int(), not ValueError)
    try:
        f = float(raw)
        return int(f) if f == int(f) and "e" not in raw.lower() else f
    except (ValueError, OverflowError):
        try:
            return float(raw)
        except ValueError:
            return raw


# OLE2 compound-document magic — the container of legacy binary .xls
# (BIFF) workbooks, which the reference's openpyxl-free pandas path
# accepts (src/schema_validata.py:862-953) but this stdlib OOXML
# (zip/XML) reader cannot parse.
_OLE2_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


def read_xlsx(path: str) -> dict[str, list[list]]:
    """{sheet_name: rows} in workbook order; each row a list padded with
    None for gap cells, trailing all-None rows dropped.

    Legacy binary ``.xls`` (OLE2/BIFF8) workbooks are detected by magic
    bytes — regardless of file extension — and routed through the
    stdlib BIFF8 reader (sources/xls.py), so every consumer (data-dict
    loader, spreadsheet ingest) reads both formats through this one
    chokepoint, matching the reference's ext dispatch
    (src/schema_validata.py:862-953)."""
    with open(path, "rb") as f:
        if f.read(8) == _OLE2_MAGIC:
            from .xls import read_xls
            return read_xls(path)
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        try:
            rels_xml = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
            rels = {r.get("Id"): r.get("Target")
                    for r in rels_xml.iter(f"{{{_NS_PKG_REL}}}Relationship")}
        except KeyError:
            rels = {}
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss.iter(f"{{{_NS_MAIN}}}si"):
                shared.append(_rich_text(si))

        out: dict[str, list[list]] = {}
        sheet_no = 0
        for sh in wb.iter(f"{{{_NS_MAIN}}}sheet"):
            sheet_no += 1
            name = sh.get("name")
            rid = sh.get(f"{{{_NS_REL}}}id")
            target = rels.get(rid) or f"worksheets/sheet{sheet_no}.xml"
            if target.startswith("/"):
                target = target.lstrip("/")
            else:
                target = "xl/" + target
            ws = ET.fromstring(z.read(target))
            rows: list[list] = []
            width = 0
            for row in ws.iter(f"{{{_NS_MAIN}}}row"):
                cells: list = []
                for c in row.iter(f"{{{_NS_MAIN}}}c"):
                    ref = c.get("r")
                    ci = _col_index(ref) if ref else len(cells)
                    while len(cells) < ci:
                        cells.append(None)
                    val = _cell_value(c, shared)
                    if len(cells) == ci:
                        cells.append(val)
                    else:
                        cells[ci] = val
                r_attr = row.get("r")
                ri = int(r_attr) - 1 if r_attr else len(rows)
                while len(rows) < ri:
                    rows.append([])
                if len(rows) == ri:
                    rows.append(cells)
                else:
                    rows[ri] = cells
                width = max(width, len(cells))
            rows = [r + [None] * (width - len(r)) for r in rows]
            while rows and all(v is None for v in rows[-1]):
                rows.pop()
            out[name] = rows
        return out


def read_xlsx_records(path: str) -> dict[str, list[dict]]:
    """{sheet: [row dicts]} — first row is the header (whitespace-trimmed
    names, matching the reference's header cleanup :694-696); sheets
    without a header row come back empty."""
    out = {}
    for name, rows in read_xlsx(path).items():
        if not rows:
            out[name] = []
            continue
        hdr = [str(h).strip() if h is not None else "" for h in rows[0]]
        recs = []
        for r in rows[1:]:
            rec = {hdr[i]: (r[i] if i < len(r) else None)
                   for i in range(len(hdr)) if hdr[i]}
            recs.append(rec)
        out[name] = recs
    return out


_INVALID_SHEET = re.compile(r"[\\/*?:\[\]]")

# XML 1.0 forbids C0 controls except \t \n \r (and ￾/￿).
# Transcript text routinely contains stray control bytes; writing them
# raw would make the workbook unreadable by Excel AND by our own
# reader, so they are dropped (openpyxl raises instead — for a report
# sink, lossy-but-openable beats an exception).
_XML_ILLEGAL = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f￾￿\ud800-\udfff]")


def _sheet_xml(rows: list[list]) -> bytes:
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
             f'<worksheet xmlns="{_NS_MAIN}"><sheetData>']
    for ri, row in enumerate(rows, start=1):
        parts.append(f'<row r="{ri}">')
        for ci, v in enumerate(row):
            if v is None:
                continue
            ref = f"{_col_letters(ci)}{ri}"
            if isinstance(v, bool):
                parts.append(f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>')
            elif isinstance(v, int) or (isinstance(v, float)
                                        and v == v and v not in
                                        (float("inf"), float("-inf"))):
                parts.append(f'<c r="{ref}"><v>{v!r}</v></c>')
            elif isinstance(v, float):
                # NaN/±inf are not valid SpreadsheetML numbers — render
                # as text the way pandas/openpyxl print them
                parts.append(f'<c r="{ref}" t="inlineStr">'
                             f'<is><t>{escape(str(v))}</t></is></c>')
            else:
                s = _XML_ILLEGAL.sub("", escape(str(v)))
                parts.append(f'<c r="{ref}" t="inlineStr">'
                             f'<is><t xml:space="preserve">{s}</t></is></c>')
        parts.append("</row>")
    parts.append("</sheetData></worksheet>")
    return "".join(parts).encode()


def write_xlsx(path: str, sheets: dict[str, list[list]],
               sheet_order: list[str] | None = None) -> str:
    """Write ``{sheet: rows}`` to an xlsx package. Sheet names are
    sanitized to Excel's constraints (invalid chars stripped, ≤31
    chars). Returns ``path``."""
    order = sheet_order or list(sheets)
    names = []
    for n in order:
        clean = _INVALID_SHEET.sub("_", str(n))[:31] or "Sheet"
        base, k = clean, 1
        while clean in names:
            k += 1
            clean = f"{base[:28]}_{k}"
        names.append(clean)

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(order)))
        z.writestr("[Content_Types].xml",
                   '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                   '<Types xmlns="http://schemas.openxmlformats.org/package/'
                   '2006/content-types">'
                   '<Default Extension="rels" ContentType="application/vnd.'
                   'openxmlformats-package.relationships+xml"/>'
                   '<Default Extension="xml" ContentType="application/xml"/>'
                   '<Override PartName="/xl/workbook.xml" ContentType='
                   '"application/vnd.openxmlformats-officedocument.'
                   'spreadsheetml.sheet.main+xml"/>'
                   f'{overrides}</Types>')
        z.writestr("_rels/.rels",
                   '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                   f'<Relationships xmlns="{_NS_PKG_REL}">'
                   '<Relationship Id="rId1" Type="http://schemas.'
                   'openxmlformats.org/officeDocument/2006/relationships/'
                   'officeDocument" Target="xl/workbook.xml"/>'
                   '</Relationships>')
        sheet_tags = "".join(
            # attribute context: quotes must be escaped too (escape()
            # alone leaves '"' and corrupts the workbook XML)
            f'<sheet name={quoteattr(names[i])} sheetId="{i + 1}" '
            f'r:id="rId{i + 1}"/>'
            for i in range(len(order)))
        z.writestr("xl/workbook.xml",
                   '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                   f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_REL}">'
                   f'<sheets>{sheet_tags}</sheets></workbook>')
        wb_rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(order)))
        z.writestr("xl/_rels/workbook.xml.rels",
                   '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                   f'<Relationships xmlns="{_NS_PKG_REL}">{wb_rels}'
                   '</Relationships>')
        for i, n in enumerate(order):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml",
                       _sheet_xml(sheets[n]))
    return path
