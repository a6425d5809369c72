"""Ingestion: typed readers with the reference's cleanup semantics.

The reference's CSV/XLSX readers (read_spreadsheets,
src/schema_validata.py:630-702; read_df_with_optimal_dtypes, :1041-1146)
do three full re-reads to infer types. Here ingest is ONE scan:
all-string read → NA canonicalization expression → per-column
``try_cast`` to the profiled/declared type. Newline stripping
(:438-460) and header trimming (:694-696) are expressions / renames.
XLSX datasets load through the stdlib OOXML reader (sources/xlsx.py) —
a workbook is driver-small by Excel's own 1,048,575-row limit, so the
rows parallelize from the driver; Parquet/Iceberg/CSV are the scale
formats.
"""

from __future__ import annotations

import codecs
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.colref import qcol
from ..functions.nulls import canonicalize_na
from ..functions.typing import decide_logical_type, type_probe_aggs

_LOGICAL_TO_SPARK = {
    "Boolean": "boolean",
    "Integer": "bigint",
    "Float": "double",
    "Datetime": "timestamp",
    "String": "string",
    "Null-Unknown": "string",
    "Other": "string",
}


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Parquet (typed) read — the fast path; no inference needed."""
    return spark.read.parquet(path)


def read_xlsx_validated(spark: SparkSession, path: str,
                        sheet_name: str | None = None,
                        rm_newlines: bool = True, replace_char: str = "",
                        infer: bool = True
                        ) -> "DataFrame | dict[str, DataFrame]":
    """XLSX dataset ingest (reference read_csv_or_excel_to_df /
    xlsx_tabs_to_pd_dataframes, src/schema_validata.py:706-776,
    :862-953): every sheet → one DataFrame keyed by sheet name (pass
    ``sheet_name`` for exactly one), values read all-string then pushed
    through the SAME cleanup + inference pipeline as CSV ingest
    (``_clean_and_infer``) — header trim, newline strip, NA
    canonicalization, probe-agg typed casts."""
    from pyspark.sql import types as T

    from .xlsx import read_xlsx

    sheets = read_xlsx(path)
    if sheet_name is not None and sheet_name not in sheets:
        raise ValueError(
            f"sheet {sheet_name!r} not found in {path!r}; "
            f"workbook has: {sorted(sheets)}")
    out: dict[str, DataFrame] = {}
    for name, rows in sheets.items():
        if sheet_name is not None and name != sheet_name:
            continue
        # pandas skips fully-blank leading rows before the header
        while rows and all(v is None for v in rows[0]):
            rows = rows[1:]
        if not rows:
            if sheet_name is not None:  # explicit ask → empty DF
                return spark.createDataFrame([], T.StructType([]))
            continue
        # header cleanup (reference :694-696) + pandas-style mangling:
        # blank cells → _c{i}, duplicates → name.1, name.2 …
        hdr, seen = [], {}
        for i, h in enumerate(rows[0]):
            name_i = str(h).strip() if h is not None else ""
            if not name_i:
                name_i = f"_c{i}"
            if name_i in seen:
                k = seen[name_i]
                while f"{name_i}.{k + 1}" in seen:
                    k += 1
                seen[name_i] = k + 1
                name_i = f"{name_i}.{k + 1}"
            seen.setdefault(name_i, 0)
            hdr.append(name_i)
        data = [tuple(None if v is None else str(v)
                      for v in (r + [None] * (len(hdr) - len(r)))[:len(hdr)])
                for r in rows[1:]]
        # explicit StructType: a DDL string would need escaping for
        # backticks/odd chars in header cells
        schema = T.StructType(
            [T.StructField(h, T.StringType(), True) for h in hdr])
        df = spark.createDataFrame(data, schema)
        out[name] = _clean_and_infer(df, rm_newlines, replace_char, infer)
    if sheet_name is not None:
        return out[sheet_name]
    return out


# UTF-32 BOMs first: BOM_UTF32_LE starts with BOM_UTF16_LE's bytes.
# BOM'd files report the BOM-CONSUMING charset ("UTF-16", not
# "UTF-16LE"): Java's endianness-specific decoders keep a leading
# U+FEFF as data, which would leak into the first header name under
# reader settings univocity's own BOM-skip doesn't cover.
_BOMS = [(codecs.BOM_UTF32_LE, "UTF-32"), (codecs.BOM_UTF32_BE, "UTF-32"),
         (codecs.BOM_UTF8, "UTF-8"), (codecs.BOM_UTF16_LE, "UTF-16"),
         (codecs.BOM_UTF16_BE, "UTF-16")]


# cp1252 maps these 0x80-0x9F bytes to real glyphs (curly quotes,
# em-dash, €, ™...); only 81/8D/8F/90/9D are unassigned. Used by the
# confidence score so cp1252 text is not punished for its smart quotes
# even though the RETURNED charset is ISO-8859-1 (Spark's CSV list).
_CP1252_PRINTABLE_C1 = frozenset(range(0x80, 0xA0)) - {0x81, 0x8D,
                                                       0x8F, 0x90, 0x9D}


def detect_file_encoding_confidence(
        file_path: str, sample_bytes: int = 1 << 20) -> tuple[str, float]:
    """Charset sniff with a chardet-shaped ``(encoding, confidence)``
    result — the reference's detect_file_encoding contract
    (src/schema_validata.py:583-626: ``chardet.detect`` → encoding +
    confidence, <50% falls back to the pandas default) rebuilt on
    stdlib evidence, scored:

    * BOM match — 1.0 (explicit declaration).
    * NUL-interleave UTF-16 — the odd/even NUL lopsidedness itself
      (≈1.0 for ASCII-heavy text, degrading exactly as the evidence
      does).
    * Strict UTF-8 decode — 1.0 for pure ASCII (every superset
      agrees); 0.99 with multi-byte sequences present (a non-UTF-8
      file forming only valid sequences is vanishingly rare).
    * BOM-less UTF-16 without NULs (CJK) — 0.8: strict decode plus a
      real newline is strong but indirect.
    * Single-byte fallback — ISO-8859-1 scored by the PRINTABLE RATIO
      of the decoded sample (cp1252's smart-quote bytes count as
      printable, see ``_CP1252_PRINTABLE_C1``), capped at 0.73:
      single-byte charset identification is genuinely uncertain —
      mirroring chardet's sub-certainty scores there. Mostly-binary
      bytes score below 0.5 and the caller falls back.

    Spark can read every name this returns (its CSV charset list);
    driver-side ingest helper — Parquet/Iceberg never touch it."""
    with open(file_path, "rb") as f:
        raw = f.read(sample_bytes)
    for bom, enc in _BOMS:
        if raw.startswith(bom):
            return enc, 1.0
    if not raw:
        return "UTF-8", 1.0
    # BOM-less UTF-16: ASCII-dominated text decodes to alternating NULs
    if raw.count(b"\x00") * 3 > len(raw):
        odd, even = raw[1::2].count(0), raw[::2].count(0)
        conf = max(odd, even) / max(1, odd + even)
        return (("UTF-16LE" if odd > even else "UTF-16BE"),
                round(conf, 3))
    has_nul = b"\x00" in raw
    # NUL bytes steer the probe ORDER, not the verdict: they usually
    # mean UTF-16 (CJK text carries sparse NULs the interleave check
    # misses — strict probe below), but a UTF-8 dump with a stray
    # \x00 from a C/DB exporter is still UTF-8 (NUL is a valid code
    # unit), so UTF-8 remains the fallback with slightly lower
    # confidence rather than mojibake-ing into ISO-8859-1.
    if not has_nul:
        try:
            raw.decode("utf-8")
            return "UTF-8", (1.0 if raw.isascii() else 0.99)
        except UnicodeDecodeError as e:
            # a multi-byte char truncated by the sample window is not
            # evidence against UTF-8
            if len(raw) == sample_bytes and e.start >= len(raw) - 4:
                return "UTF-8", 0.99
    # BOM-less UTF-16 of NON-Latin text (CJK code units carry no NUL
    # bytes, so the interleave probe above misses it). Discriminator:
    # a real UTF-16 CSV decodes strictly AND contains '\n' (0A 00 /
    # 00 0A pairs); single-byte text read as UTF-16 yields U+XX0A
    # composites, never U+000A, so latin-1 files can't false-positive.
    for enc, name in (("utf-16-le", "UTF-16LE"), ("utf-16-be", "UTF-16BE")):
        if len(raw) % 2:
            break
        try:
            t = raw.decode(enc)
        except UnicodeDecodeError:
            continue
        if "\n" in t and not any(c < " " and c not in "\t\r\n" for c in t):
            return name, 0.8
    if has_nul:
        try:
            raw.decode("utf-8")
            return "UTF-8", 0.9            # valid UTF-8, stray NUL(s)
        except UnicodeDecodeError:
            pass
    printable = sum(
        1 for b in raw
        if b >= 0xA0 or b in _CP1252_PRINTABLE_C1
        or 0x20 <= b < 0x7F or b in (0x09, 0x0A, 0x0D))
    return "ISO-8859-1", round(0.73 * printable / len(raw), 3)


def detect_file_encoding(file_path: str, sample_bytes: int = 1 << 20) -> str:
    """Charset for reading ``file_path`` — the reference's semantics
    exactly (src/schema_validata.py:583-626): take the detected
    encoding when confidence exceeds 50%, otherwise warn and fall back
    to the default (UTF-8, what pandas' ``encoding=None`` reads).
    ``detect_file_encoding_confidence`` exposes the raw pair."""
    enc, conf = detect_file_encoding_confidence(file_path, sample_bytes)
    if conf <= 0.5:
        import logging
        logging.getLogger(__name__).warning(
            "Encoding confidence for '%s' is low (%.0f%% <= 50%%). "
            "Using the UTF-8 default.", file_path, conf * 100)
        return "UTF-8"
    return enc


def _detect_dir_encoding(path: str) -> str:
    """Resolve 'auto' for a file, a glob pattern, or a (possibly
    Hive-partitioned) directory of CSV parts — sniffs the FIRST data
    file found (Spark's encoding option is per-read, one charset for
    all parts). Best-effort: any filesystem surprise falls back to
    UTF-8 rather than failing a read Spark itself could do."""
    import glob as _glob
    try:
        if os.path.isfile(path):        # explicit file: sniff it, even
            return detect_file_encoding(path)   # if named _like_a_part
        candidates = (sorted(_glob.glob(path)) if _glob.has_magic(path)
                      else [path])
        seen = 0
        while candidates and seen < 4096:   # bounded directory walk
            p = candidates.pop(0)
            seen += 1
            base = os.path.basename(p.rstrip("/"))
            if base.startswith((".", "_")):
                continue
            if os.path.isdir(p):
                candidates[:0] = [os.path.join(p, n)
                                  for n in sorted(os.listdir(p))]
            elif os.path.isfile(p):
                return detect_file_encoding(p)
    except OSError:
        pass
    return "UTF-8"


def read_spreadsheet(spark: SparkSession, path: str,
                     sheet_name: str | None = None, **kw):
    """Dispatch CSV vs Excel by extension (reference
    read_csv_or_excel_to_df :862-953). Both OOXML ``.xlsx`` and legacy
    binary ``.xls`` (BIFF8, via the stdlib OLE2 reader in
    sources/xls.py) route through the workbook path; pre-Excel-97
    BIFF5/7 and encrypted workbooks fail fast with a clear error."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".xlsx", ".xlsm", ".xls"):
        return read_xlsx_validated(spark, path, sheet_name=sheet_name, **kw)
    return read_csv_validated(spark, path, **kw)


def read_csv_validated(spark: SparkSession, path: str,
                       rm_newlines: bool = True, replace_char: str = "",
                       infer: bool = True,
                       encoding: str = "UTF-8",
                       multiline: bool = True) -> DataFrame:
    """CSV ingest with reference cleanup semantics in ONE scan + one
    stats job: header-trimmed column names, newline stripping, extended
    NA canonicalization, then per-column logical-type try_cast (replaces
    the reference's three re-reads).

    ``multiline=True`` (default) parses RFC-4180 quoted fields that
    contain newlines — the reference's pandas reader does, and without
    it such rows split into corrupt records before ``rm_newlines`` can
    strip anything. Scale note: multiLine CSV is NOT splittable (one
    task per file); pass ``multiline=False`` for big known-clean
    machine-written CSVs, or better, use Parquet for the scale path.

    ``encoding="auto"`` sniffs the charset from the file bytes
    (``detect_file_encoding``) before the Spark read."""
    if encoding.lower() == "auto":
        encoding = _detect_dir_encoding(path)
    reader = (spark.read.option("header", "true")
              .option("encoding", encoding)
              # RFC 4180 doubled-quote escaping ("" inside a quoted
              # field), pandas' default dialect
              .option("escape", '"'))
    if multiline:
        reader = reader.option("multiLine", "true")
    return _clean_and_infer(reader.csv(path), rm_newlines, replace_char,
                            infer)


def _clean_and_infer(df: DataFrame, rm_newlines: bool, replace_char: str,
                     infer: bool) -> DataFrame:
    # qcol(c) (not F.col / df[c]) throughout: spreadsheet headers
    # legally contain dots ('No.', 'price.usd') which F.col parses as
    # struct access and Dataset.apply rejects as invalid syntax
    df = df.toDF(*[c.strip() for c in df.columns])
    if rm_newlines:
        df = df.select([
            F.regexp_replace(qcol(c), r"[\r\n]", replace_char).alias(c)
            for c in df.columns])
    df = canonicalize_na(df)
    if not infer:
        return df
    aggs = []
    for c in df.columns:
        aggs += type_probe_aggs(c, qcol(c))
    row = df.agg(*aggs).collect()[0].asDict()
    casts = []
    dt_candidates: list[str] = []
    for c in df.columns:
        probes = {p: row.get(f"{c}__{p}") or 0
                  for p in ["nonnull", "int_ok", "float_ok", "bool_ok",
                            "ts_ok", "lead0"]}
        logical = decide_logical_type(probes)
        target = _LOGICAL_TO_SPARK[logical]
        if target == "string":
            casts.append(qcol(c))
        elif target == "timestamp":
            # COLUMN-level format election (reference
            # infer_datetime_column :508-579): ONE format is elected for
            # the whole column and every cell parses with it. A per-cell
            # first-match over COMMON_DATETIMES would silently mix
            # M/d-vs-d/M interpretations within one column ('03/04/2024'
            # → Mar 4 but '25/12/2024' → day-first) — the election keeps
            # the column self-consistent, converted below.
            dt_candidates.append(c)
            casts.append(qcol(c))
        elif target == "boolean":
            casts.append(F.lower(F.trim(qcol(c))).try_cast("boolean").alias(c))
        else:
            casts.append(F.trim(qcol(c)).try_cast(target).alias(c))
    out = df.select(casts)
    if dt_candidates:
        # ONE chunked election job for every candidate column + one
        # select with the elected parses (a per-column election would
        # pay k serial scans); no-format columns stay string
        from ..functions.datetimes import convert_datetime_columns
        out = convert_datetime_columns(out, dt_candidates)
    return out
