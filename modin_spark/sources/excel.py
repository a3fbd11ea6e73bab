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


def _row_spans(sheet_xml: bytes) -> tuple[bytes, list[tuple[int, int]]]:
    """(body, [(start, end)] per <row>...</row>) inside sheetData."""
    lo = sheet_xml.find(b"<sheetData")
    hi = sheet_xml.find(b"</sheetData>")
    if lo < 0 or hi < 0:
        return b"", []
    lo = sheet_xml.find(b">", lo) + 1
    body = sheet_xml[lo:hi]
    starts = [m.start() for m in _ROW_OPEN.finditer(body)]
    spans = []
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else len(body)
        spans.append((s, e))
    return body, spans


def _parse_rows(xml_chunk: bytes, shared: list[str]) -> list[list]:
    """Rows of Python values from a concatenation of <row> elements.
    Chunks are extracted RAW (no xmlns declared on the wrapper), so tags
    parse unqualified regardless of the document's default namespace."""
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
            vals[pos] = val
        rows.append(vals)
    return rows


def _co_bool(v):
    return bool(v) if v is not None else None


def _co_long(v):
    return int(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else None


def _co_double(v):
    return float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else None


def _co_str(v):
    return v if isinstance(v, str) else (None if v is None else repr(v))


_COERCE = {"boolean": _co_bool, "bigint": _co_long, "double": _co_double, "string": _co_str}


def _infer_types(sample_rows: list[list], width: int) -> list[str]:
    """Per-column spark DDL type from a bounded sample (picklable tags —
    the coercer functions themselves are module-level for broadcast)."""

    def kind(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return "b"
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
        body, spans = _row_spans(zf.read(member))

    skip = int(skiprows or 0)
    hdr_vals: list = []
    data_spans = spans[skip:]
    if header is not None:
        if data_spans:
            s, e = data_spans[int(header)]
            hrow = _parse_rows(body[s:e], shared)
            hdr_vals = hrow[0] if hrow else []
        data_spans = data_spans[int(header) + 1 :]
    if nrows is not None:
        data_spans = data_spans[: int(nrows)]

    # bounded driver-side sample from the FIRST chunk only (bytes already
    # in hand — no extra IO) for width + dtype inference
    sample_spans = data_spans[: min(len(data_spans), 200)]
    sample = (
        _parse_rows(body[sample_spans[0][0] : sample_spans[-1][1]], shared)
        if sample_spans
        else []
    )
    width = max([len(r) for r in sample] + [len(hdr_vals)], default=0)
    if names is not None:
        cols = [str(c) for c in names]
        width = max(width, len(cols))
    elif header is not None:
        cols = [
            str(hdr_vals[i]) if i < len(hdr_vals) and hdr_vals[i] is not None
            else f"Unnamed: {i}"
            for i in range(width)
        ]
    else:
        cols = [str(i) for i in range(width)]
    types = _infer_types(sample, width)
    schema = ", ".join(f"`{c}` {t}" for c, t in zip(cols, types))
    if not data_spans or not width:
        return spark.createDataFrame([], schema or "`Unnamed: 0` string")

    # row-aligned byte chunks; parsing is the expensive part and it runs in
    # executor tasks (reference: excel_dispatcher hands byte chunks to
    # partition tasks the same way)
    chunks = []
    for i in range(0, len(data_spans), chunk_rows):
        grp = data_spans[i : i + chunk_rows]
        chunks.append(bytes(body[grp[0][0] : grp[-1][1]]))
    bc = spark.sparkContext.broadcast((chunks, shared, types, width))

    def parse(batches):
        chs, sh, tps, w = bc.value
        fns = [_COERCE[t] for t in tps]
        for pdf in batches:
            for i in pdf.iloc[:, 0]:
                rows = _parse_rows(chs[int(i)], sh)
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

_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def write_xlsx(pdf: pd.DataFrame, path: str, sheet_name: str = "Sheet1",
               index: bool = False, header: bool = True) -> None:
    """Minimal OOXML writer: one sheet, inline strings (no sharedStrings,
    no styles). Numbers stay numeric; bools typed; NaN/None -> empty cell;
    everything else stringified."""
    if index:
        pdf = pdf.reset_index()
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{_esc(str(sheet_name))}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
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
            elif isinstance(v, int):
                buf.write(f'<c r="{ref}"><v>{v}</v></c>')
            elif isinstance(v, float):
                buf.write(f'<c r="{ref}"><v>{float(v)!r}</v></c>')
            else:
                buf.write(f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{_esc(str(v))}</t></is></c>')
        buf.write("</row>")
    buf.write("</sheetData></worksheet>")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CT)
        zf.writestr("_rels/.rels", _RELS)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", buf.getvalue())
