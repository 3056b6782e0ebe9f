"""Minimal dependency-free XLSX writer/reader (SURVEY S8).

The reference writes the DNS report as a real .xlsx via ``tealeg/xlsx``
(``/root/reference/mainDNS.go:120-137``: one sheet "dns", one row per
subdomain — ``["found", entry]`` cells per resolved record, or
``["not found", name]``). No spreadsheet library ships in this environment,
so this module emits the OOXML spreadsheet package directly (an .xlsx file
is a zip of five XML parts; inline strings avoid the sharedStrings table).
``read_xlsx_rows`` parses the same subset back for round-trip tests.
"""

from __future__ import annotations

import zipfile
import zlib
from xml.etree import ElementTree
from xml.sax.saxutils import escape

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    """0-based column index → A, B, …, Z, AA, …"""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_xlsx(rows: list[list[str]], path: str, sheet_name: str = "dns") -> None:
    """Write ``rows`` (lists of strings) as a single-sheet .xlsx file."""
    cells = []
    for r, row in enumerate(rows):
        cs = "".join(
            f'<c r="{_col_letter(c)}{r + 1}" t="inlineStr">'
            f"<is><t xml:space=\"preserve\">{escape(str(v))}</t></is></c>"
            for c, v in enumerate(row)
        )
        cells.append(f'<row r="{r + 1}">{cs}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(cells)}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK.format(name=escape(sheet_name)))
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def read_xlsx_rows(path: str) -> list[list[str]]:
    """Parse back the inline-string subset written by ``write_xlsx``.

    Malformed files raise ValueError only (zip/XML error classes are
    converted) — report-ingest callers catch ValueError per file."""
    try:
        with zipfile.ZipFile(path) as z:
            root = ElementTree.fromstring(z.read("xl/worksheets/sheet1.xml"))
    except (zipfile.BadZipFile, KeyError, EOFError, OSError,
            ElementTree.ParseError, zlib.error, NotImplementedError,
            RuntimeError) as e:
        # NotImplementedError here is zipfile's corrupt-version/method
        # report, not this repo's honest-stub contract; RuntimeError is its
        # encrypted-entry report
        raise ValueError(f"malformed xlsx: {e}") from e
    out = []
    for row in root.iter(f"{_NS}row"):
        vals = []
        for c in row.iter(f"{_NS}c"):
            t = c.find(f"{_NS}is/{_NS}t")
            vals.append(t.text or "" if t is not None else "")
        out.append(vals)
    return out


def dns_report_rows(results: list[dict]) -> list[list[str]]:
    """Rows in the reference's dnsReportExcel shape (mainDNS.go:125-133):
    per scanned name — ``["found", record, "found", record, ...]`` when
    resolved (one pair per record), else ``["not found", name + "\\n"]``."""
    rows = []
    for r in results:
        if r.get("found"):
            recs = [x for x in str(r.get("records", "")).split(",") if x]
            row: list[str] = []
            for rec in recs:
                row.extend(["found", rec])
            rows.append(row or ["found", ""])
        else:
            rows.append(["not found", f"{r['name']}\n"])
    return rows
