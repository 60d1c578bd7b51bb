"""Minimal pure-stdlib XLSX I/O (no openpyxl in the runtime).

Implements exactly what the engine needs from the OOXML SpreadsheetML
format (ECMA-376, public spec):

- :func:`read_rows` — cell grid of one sheet (shared-string, inline-
  string, and numeric cells), for the Excel schema-template loader
  (reference O6, ``dbtransposer-schema.go:160-200``).
- :func:`write_sheet` — one-sheet workbook with inline-string cells,
  for the Excel export sink (reference O17, ``fileloader-schema.go:
  576-606``).

Both are driver-side (schema templates and small extracts), never in
the distributed row path.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")


def _col_index(ref: str) -> int:
    """'A'→0, 'B'→1, … 'AA'→26 (cell-reference column part)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def read_rows(path: str, sheet: str = "Sheet1") -> list[list[object]]:
    """Return the cell grid of ``sheet`` as row-major lists (None = empty).

    Rows are padded to the widest row; values are str for string cells
    and float/int for numeric cells.

    Totality (r9, ingest-surface contract): a damaged workbook — not a
    zip, zip missing the workbook parts, ill-formed sheet XML — raises
    a clean ``ValueError`` naming the file and cause instead of leaking
    ``BadZipFile`` / ``KeyError`` / ``ParseError`` internals (the
    reference reads its Excel template at startup and errors the job
    there too, ``dbtransposer-schema.go:160-200``)."""
    try:
        return _read_rows_raw(path, sheet)
    except ValueError:
        raise
    except FileNotFoundError:
        raise  # a missing path is not a damaged workbook — keep the
        # standard, actionable exception type
    except (zipfile.BadZipFile, KeyError, ET.ParseError, OSError) as exc:
        raise ValueError(
            f"unreadable xlsx workbook {path!r}: {type(exc).__name__}: {exc}"
        ) from exc


def _read_rows_raw(path: str, sheet: str) -> list[list[object]]:
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            r.get("Id"): r.get("Target") for r in rels.findall(f"{_REL_NS}Relationship")
        }
        sheet_target = None
        for sh in wb.findall(f"{_NS}sheets/{_NS}sheet"):
            if sh.get("name") == sheet:
                rid = sh.get(
                    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
                )
                sheet_target = rid_to_target.get(rid)
                break
        if sheet_target is None:
            raise KeyError(f"sheet {sheet!r} not found in {path!r}")
        sheet_path = "xl/" + sheet_target.lstrip("/").removeprefix("xl/")

        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))

        ws = ET.fromstring(z.read(sheet_path))
        grid: list[list[object]] = []
        for row in ws.findall(f"{_NS}sheetData/{_NS}row"):
            cells: dict[int, object] = {}
            for c in row.findall(f"{_NS}c"):
                ref = c.get("r") or ""
                m = _CELL_REF.match(ref)
                if not m:
                    continue
                idx = _col_index(m.group(1))
                ctype = c.get("t", "n")
                if ctype == "s":  # shared string
                    v = c.find(f"{_NS}v")
                    cells[idx] = shared[int(v.text)] if v is not None else None
                elif ctype == "inlineStr":
                    cells[idx] = "".join(t.text or "" for t in c.iter(f"{_NS}t"))
                elif ctype == "str":  # formula cached string
                    v = c.find(f"{_NS}v")
                    cells[idx] = v.text if v is not None else None
                else:  # numeric / boolean
                    v = c.find(f"{_NS}v")
                    if v is None or v.text is None:
                        cells[idx] = None
                    else:
                        num = float(v.text)
                        cells[idx] = int(num) if num.is_integer() else num
            width = max(cells) + 1 if cells else 0
            grid.append([cells.get(i) for i in range(width)])
        width = max((len(r) for r in grid), default=0)
        return [r + [None] * (width - len(r)) for r in grid]


def _cell_ref(row: int, col: int) -> str:
    """0-based (row, col) → 'A1'-style reference."""
    col += 1
    letters = ""
    while col:
        col, rem = divmod(col - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return f"{letters}{row + 1}"


#: XML 1.0 forbids these code points OUTRIGHT (no escape exists): C0
#: controls other than tab/newline/CR, plus U+FFFE/U+FFFF. A cell value
#: containing one would make the whole workbook ill-formed — found by
#: feeding the adversarial mini-corpus through export_excel (r8).
#: Lone surrogates (U+D800–DFFF) are included too (ADVICE r8): a str
#: carrying one — e.g. from surrogateescape decoding of invalid UTF-8 —
#: survives translate/escape but crashes the UTF-8 encode of the sheet
#: XML, exactly the one-dirty-cell job failure this table prevents
#: (openpyxl's illegal-character set also covers them).
#: openpyxl raises IllegalCharacterError here; an exporter must not
#: fail the job on one dirty cell, so they are stripped (the same
#: behavior as pandas' Excel writers).
_XML_ILLEGAL = dict.fromkeys(
    [
        *range(0x00, 0x09),
        0x0B,
        0x0C,
        *range(0x0E, 0x20),
        *range(0xD800, 0xE000),
        0xFFFE,
        0xFFFF,
    ]
)


def write_sheet(path: str, rows: list[list[object]], sheet: str = "Sheet1") -> None:
    """Write a single-sheet workbook; every cell as an inline string.
    XML-illegal code points are stripped from cell text (see
    ``_XML_ILLEGAL``)."""
    body = ["<sheetData>"]
    for ri, row in enumerate(rows):
        body.append(f'<row r="{ri + 1}">')
        for ci, val in enumerate(row):
            if val is None:
                continue
            body.append(
                f'<c r="{_cell_ref(ri, ci)}" t="inlineStr"><is><t xml:space="preserve">'
                f"{escape(str(val).translate(_XML_ILLEGAL))}</t></is></c>"
            )
        body.append("</row>")
    body.append("</sheetData>")
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        + "".join(body)
        + "</worksheet>"
    )
    workbook_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        # attribute context: escape() alone leaves '"' intact, which would
        # terminate the attribute early — pass the quote mapping explicitly
        f'<sheets><sheet name="{escape(sheet, {chr(34): "&quot;"})}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    workbook_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook_xml)
        z.writestr("xl/_rels/workbook.xml.rels", workbook_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
