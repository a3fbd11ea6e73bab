"""Parallel XLSX reader/writer over the public ECMA-376 (OOXML) zip+XML
format, stdlib-only (zipfile + xml.etree — no openpyxl in this environment).

Parity target: the reference's chunked Excel dispatcher
(/root/reference/modin/core/io/text/excel_dispatcher.py), which opens the
workbook once on the driver, splits the worksheet XML into ``<row>``-aligned
byte chunks, and hands chunks to parallel workers for parsing. Same plan
here: the driver does ONE streaming zip decompression of the sheet member
(zlib C speed, no XML walk) to cut row-aligned chunks; the expensive XML
parse + cell typing runs as Spark tasks (``mapInPandas`` over a range of
chunk ids, chunks shipped via broadcast). Driver memory holds the raw sheet
XML once — identical cost class to the reference, which also materializes
the file driver-side before chunking.

Cell typing follows the spec: ``t="s"`` shared string, ``t="str"`` formula
string, ``t="b"`` boolean, ``t="inlineStr"`` inline, ``t="e"`` error (NaN),
default numeric. Column dtypes are inferred from a bounded sample of the
first chunk (documented sampling contract, same as groupby_apply schema
inference); pass ``dtype=`` to override per column.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

import pandas as pd

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _col_idx(ref: str) -> int:
    """'A1' -> 0, 'AB3' -> 27."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _col_letter(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(65 + r) + s
    return s


def _sheet_members(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, zip_member)], workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {}
    for rel in rels:
        t = rel.get("Target", "")
        if not t.startswith("/"):
            t = "xl/" + t
        else:
            t = t.lstrip("/")
        rid_to_target[rel.get("Id")] = t
    out = []
    for sh in wb.iter(f"{_NS}sheet"):
        rid = sh.get(f"{_R_NS}id") or sh.get("id")
        member = rid_to_target.get(rid)
        if member:
            out.append((sh.get("name"), member))
    return out


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root:
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


_ROW_OPEN = re.compile(rb"<row[ >]")
_ROW_R = re.compile(rb"<row[^>]*?\br=\"(\d+)\"")

# date serial epoch: serial 1 == 1900-01-01 with Excel's 1900 leap-year bug;
# the 1899-12-30 origin (same convention as pandas/openpyxl) absorbs it for
# every serial >= 61, i.e. all modern dates
_EXCEL_EPOCH = __import__("datetime").datetime(1899, 12, 30)

# builtin numFmtIds that render as dates/times (ECMA-376 §18.8.30)
_BUILTIN_DATE_FMTS = (
    set(range(14, 23)) | set(range(27, 37)) | {45, 46, 47} | set(range(50, 59))
)


def _date_styles(zf: zipfile.ZipFile) -> frozenset:
    """Style indices (cell `s` attributes index cellXfs) whose number format
    is a date/time format — these cells store numeric day serials and must
    come back as timestamps, not floats."""
    try:
        root = ET.fromstring(zf.read("xl/styles.xml"))
    except KeyError:
        return frozenset()
    custom = {}
    for nf in root.iter(f"{_NS}numFmt"):
        try:
            custom[int(nf.get("numFmtId"))] = nf.get("formatCode") or ""
        except (TypeError, ValueError):
            pass

    def is_date(fmt_id: int) -> bool:
        if fmt_id in custom:
            # strip quoted literals, [..] modifiers and escaped chars before
            # looking for date tokens (y/m/d/h/s); a numeric placeholder
            # anywhere means it's a number format like 0.00 "m"
            code = re.sub(r'"[^"]*"|\[[^\]]*\]|\\.', "", custom[fmt_id])
            return bool(re.search(r"[ymdhs]", code, re.I)) and not re.search(
                r"[#0?]", code
            )
        return fmt_id in _BUILTIN_DATE_FMTS

    cell_xfs = root.find(f"{_NS}cellXfs")
    if cell_xfs is None:
        return frozenset()
    out = set()
    for i, xf in enumerate(cell_xfs):
        if _strip_ns(xf.tag) != "xf":
            continue
        try:
            if is_date(int(xf.get("numFmtId", "0"))):
                out.add(i)
        except ValueError:
            pass
    return frozenset(out)


def _serial_to_dt(serial: float):
    import datetime as _dt

    day, frac = divmod(float(serial), 1.0)
    # round sub-day part to microseconds like openpyxl's from_excel
    return _EXCEL_EPOCH + _dt.timedelta(days=int(day), seconds=round(frac * 86400, 6))


def _row_spans(sheet_xml: bytes) -> tuple[bytes, list[tuple[int, int, int]]]:
    """(body, [(start, end, rownum)] per <row>...</row>) inside sheetData.
    rownum is the 1-based sheet row from the row's `r` attribute (Excel omits
    <row> elements for fully blank rows — the caller re-inserts the gaps);
    rows without `r` count up from the previous one, per spec."""
    lo = sheet_xml.find(b"<sheetData")
    hi = sheet_xml.find(b"</sheetData>")
    if lo < 0 or hi < 0:
        return b"", []
    lo = sheet_xml.find(b">", lo) + 1
    body = sheet_xml[lo:hi]
    starts = [m.start() for m in _ROW_OPEN.finditer(body)]
    spans = []
    prev_r = 0
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else len(body)
        m = _ROW_R.match(body, s)
        r = int(m.group(1)) if m else prev_r + 1
        prev_r = r
        spans.append((s, e, r))
    return body, spans


def _mangle_dupes(cols: list) -> list:
    """pandas header dedup: x, x, x -> x, x.1, x.2."""
    seen: dict = {}
    out = []
    for c in cols:
        k = seen.get(c, 0)
        seen[c] = k + 1
        if k == 0:
            out.append(c)
        else:
            nc = f"{c}.{k}"
            while nc in seen:
                k += 1
                seen[c] = k + 1
                nc = f"{c}.{k}"
            seen[nc] = 1
            out.append(nc)
    return out


def _parse_rows(
    xml_chunk: bytes, shared: list[str], date_styles: frozenset = frozenset()
) -> list[list]:
    """Rows of Python values from a concatenation of <row> elements.
    Chunks are extracted RAW (no xmlns declared on the wrapper), so tags
    parse unqualified regardless of the document's default namespace.
    Numeric cells whose style index is in ``date_styles`` are day serials
    and decode to datetimes (time-only formats land on the 1899-12-30
    epoch date — documented divergence from pandas' datetime.time)."""
    root = ET.fromstring(b"<R>" + xml_chunk + b"</R>")
    rows = []
    for row_el in root:
        if _strip_ns(row_el.tag) != "row":
            continue
        vals: list = []
        pos = -1
        for c in row_el:
            if _strip_ns(c.tag) != "c":
                continue
            ref = c.get("r")
            pos = _col_idx(ref) if ref else pos + 1
            while len(vals) <= pos:
                vals.append(None)
            t = c.get("t")
            val = None
            if t == "inlineStr":
                texts = [e.text or "" for e in c.iter() if _strip_ns(e.tag) == "t"]
                val = "".join(texts) if texts else None
            else:
                v_el = next((e for e in c if _strip_ns(e.tag) == "v"), None)
                if v_el is not None and v_el.text is not None:
                    x = v_el.text
                    if t == "s":
                        val = shared[int(x)]
                    elif t == "str":
                        val = x
                    elif t == "b":
                        val = x in ("1", "true", "TRUE")
                    elif t == "e":
                        val = None
                    else:
                        try:
                            val = int(x)
                        except ValueError:
                            val = float(x)
                        if date_styles and c.get("s") is not None and int(c.get("s")) in date_styles:
                            val = _serial_to_dt(val)
            vals[pos] = val
        rows.append(vals)
    return rows


def _co_bool(v):
    return bool(v) if v is not None else None


def _co_long(v):
    # non-integral floats beyond the inference sample must NOT truncate —
    # null them (sampling-contract miss) instead of corrupting 2.5 -> 2
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        return None
    if isinstance(v, float) and not v.is_integer():
        return None
    return int(v)


def _co_double(v):
    return float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else None


def _co_str(v):
    return v if isinstance(v, str) else (None if v is None else repr(v))


def _co_ts(v):
    import datetime as _dt

    return v if isinstance(v, _dt.datetime) else None


_COERCE = {
    "boolean": _co_bool,
    "bigint": _co_long,
    "double": _co_double,
    "string": _co_str,
    "timestamp": _co_ts,
}


def _infer_types(sample_rows: list[list], width: int) -> list[str]:
    """Per-column spark DDL type from a bounded sample (picklable tags —
    the coercer functions themselves are module-level for broadcast)."""

    import datetime as _dt

    def kind(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return "b"
        if isinstance(v, _dt.datetime):
            return "d"
        if isinstance(v, int):
            return "i"
        if isinstance(v, float):
            return "f"
        return "s"

    out = []
    for ci in range(width):
        kinds = {kind(r[ci]) for r in sample_rows if ci < len(r)} - {None}
        if kinds == {"b"}:
            out.append("boolean")
        elif kinds == {"d"}:
            out.append("timestamp")
        elif kinds == {"i"}:
            out.append("bigint")
        elif kinds <= {"i", "f"} and kinds:
            out.append("double")
        else:
            out.append("string")
    return out


def read_xlsx_spark(path: str, sheet_name=0, header: int = 0, names=None,
                    usecols=None, skiprows: int = 0, nrows=None,
                    chunk_rows: int = 4096):
    """Distributed xlsx read -> Spark DataFrame. Raises on anything the
    stdlib parser can't handle — the caller falls back to the driver-side
    pandas delegate (the reference's own escape hatch)."""
    from modin_spark.session import get_spark

    spark = get_spark()
    with zipfile.ZipFile(path) as zf:
        sheets = _sheet_members(zf)
        if isinstance(sheet_name, str):
            member = dict(sheets)[sheet_name]
        else:
            member = sheets[int(sheet_name)][1]
        shared = _shared_strings(zf)
        date_styles = _date_styles(zf)
        body, spans = _row_spans(zf.read(member))

    # LOGICAL row grid 1..max_rownum: Excel omits <row> elements for fully
    # blank rows; pandas emits them as all-NaN rows, so header/skiprows/nrows
    # must index the grid, not the present-rows list
    logical: list = []
    if spans:
        logical = [None] * spans[-1][2]
        for s, e, r in spans:
            logical[r - 1] = (s, e)

    def parse_span(sp):
        if sp is None:
            return []
        rows = _parse_rows(body[sp[0] : sp[1]], shared, date_styles)
        return rows[0] if rows else []

    skip = int(skiprows or 0)
    hdr_vals: list = []
    data_rows = logical[skip:]
    if header is not None:
        hdr_vals = parse_span(data_rows[int(header)]) if data_rows else []
        data_rows = data_rows[int(header) + 1 :]
    # pandas drops trailing all-blank rows (openpyxl stops at max_row)
    while data_rows and data_rows[-1] is None:
        data_rows.pop()
    if nrows is not None:
        data_rows = data_rows[: int(nrows)]

    # bounded driver-side sample from the FIRST chunk only (bytes already
    # in hand — no extra IO) for width + dtype inference
    sample: list = []
    for sp in data_rows[: min(len(data_rows), 200)]:
        if sp is None:
            sample.append([])
        else:
            sample.extend(_parse_rows(body[sp[0] : sp[1]], shared, date_styles))
    width = max([len(r) for r in sample] + [len(hdr_vals)], default=0)
    if names is not None:
        cols = [str(c) for c in names]
        width = max(width, len(cols))
    elif header is not None:
        cols = _mangle_dupes([
            str(hdr_vals[i]) if i < len(hdr_vals) and hdr_vals[i] is not None
            else f"Unnamed: {i}"
            for i in range(width)
        ])
    else:
        cols = [str(i) for i in range(width)]
    types = _infer_types(sample, width)
    schema = ", ".join(f"`{c}` {t}" for c, t in zip(cols, types))
    if not data_rows or not width:
        return spark.createDataFrame([], schema or "`Unnamed: 0` string")

    # row-aligned byte chunks; parsing is the expensive part and it runs in
    # executor tasks (reference: excel_dispatcher hands byte chunks to
    # partition tasks the same way). Each chunk carries the offsets of its
    # PRESENT rows inside its logical window so blank rows rematerialize
    # as all-NaN rows executor-side.
    chunks = []
    for i in range(0, len(data_rows), chunk_rows):
        grp = data_rows[i : i + chunk_rows]
        present = [(j, sp) for j, sp in enumerate(grp) if sp is not None]
        if present:
            raw = bytes(body[present[0][1][0] : present[-1][1][1]])
        else:
            raw = b""
        chunks.append((raw, [j for j, _ in present], len(grp)))
    bc = spark.sparkContext.broadcast((chunks, shared, date_styles, types, width))

    def parse(batches):
        chs, sh, dst, tps, w = bc.value
        fns = [_COERCE[t] for t in tps]
        for pdf in batches:
            for i in pdf.iloc[:, 0]:
                raw, offsets, n_logical = chs[int(i)]
                parsed = _parse_rows(raw, sh, dst) if raw else []
                rows: list = [[]] * n_logical
                for off, r in zip(offsets, parsed):
                    rows[off] = r
                data = {
                    cols[ci]: [fns[ci](r[ci] if ci < len(r) else None) for r in rows]
                    for ci in range(w)
                }
                yield pd.DataFrame(data)

    n_parts = max(1, min(len(chunks), spark.sparkContext.defaultParallelism))
    sdf = spark.range(len(chunks), numPartitions=n_parts).mapInPandas(parse, schema)
    if usecols is not None:
        sdf = sdf.select(*[str(c) for c in usecols])
    return sdf


# ---------------------------------------------------------------------------
# writer (driver-side, like the reference's to_excel default_to_pandas; used
# for fixtures and to_excel without openpyxl)
# ---------------------------------------------------------------------------

# style index 1 = builtin numFmt 22 (m/d/yy h:mm) — datetime cells
_STYLES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    '<fonts count="1"><font/></fonts><fills count="1"><fill/></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
    '<cellXfs count="2"><xf numFmtId="0"/>'
    '<xf numFmtId="22" applyNumberFormat="1"/></cellXfs>'
    "</styleSheet>"
)
_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def write_xlsx(pdf, path: str, sheet_name: str = "Sheet1",
               index: bool = False, header: bool = True) -> None:
    """Minimal OOXML writer: inline strings (no sharedStrings). Numbers
    stay numeric; bools typed; NaN/None -> empty cell; everything else
    stringified. ``pdf`` may be a DataFrame (one sheet) or a dict
    ``{name: DataFrame}`` (multi-sheet workbook — the pandas ExcelWriter
    shape; read back by read_excel(sheet_name=None))."""
    sheets = pdf if isinstance(pdf, dict) else {sheet_name: pdf}
    sheets = {str(n): (d.reset_index() if index else d) for n, d in sheets.items()}
    names = list(sheets)
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        "<sheets>"
        + "".join(
            f'<sheet name="{_esc(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        + "</sheets></workbook>"
    )
    ct = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        + '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        "</Types>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + f'<Relationship Id="rId{len(names) + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("_rels/.rels", _RELS)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/styles.xml", _STYLES)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, n in enumerate(names):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(sheets[n], header))


def _sheet_xml(pdf: pd.DataFrame, header: bool = True) -> str:
    buf = io.StringIO()
    buf.write(
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
    )
    rows = []
    if header:
        rows.append([str(c) for c in pdf.columns])
    for tup in pdf.itertuples(index=False, name=None):
        rows.append(list(tup))
    for ri, row in enumerate(rows, start=1):
        buf.write(f'<row r="{ri}">')
        for ci, v in enumerate(row):
            # numpy scalars: np.int64 is NOT a python int, and numpy>=2
            # repr(np.float64(x)) is 'np.float64(x)' — normalize first
            if hasattr(v, "item") and type(v).__module__ == "numpy":
                v = v.item()
            if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
                continue
            ref = f"{_col_letter(ci)}{ri}"
            if isinstance(v, bool):
                buf.write(f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>')
            elif isinstance(v, __import__("datetime").datetime):
                serial = (v - _EXCEL_EPOCH).total_seconds() / 86400.0
                buf.write(f'<c r="{ref}" s="1"><v>{serial!r}</v></c>')
            elif isinstance(v, int):
                buf.write(f'<c r="{ref}"><v>{v}</v></c>')
            elif isinstance(v, float):
                buf.write(f'<c r="{ref}"><v>{float(v)!r}</v></c>')
            else:
                buf.write(f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{_esc(str(v))}</t></is></c>')
        buf.write("</row>")
    buf.write("</sheetData></worksheet>")
    return buf.getvalue()
