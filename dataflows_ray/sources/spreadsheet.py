"""Spreadsheet codecs implemented from public file-format specs — no
openpyxl/xlrd/odfpy in this container.

- xlsx: ECMA-376 OOXML SpreadsheetML (a zip of XML parts). Reader
  resolves sheet name -> rId -> part via the workbook rels, handles
  shared strings, inline strings, numbers, booleans, and sparse cell
  references; writer emits inline-string worksheets (valid per spec,
  avoids a sharedStrings part).
- ods: OASIS OpenDocument spreadsheet (zip with ``content.xml``).
  Reader expands ``number-columns-repeated`` and reads typed
  ``office:value-type`` cells; writer emits a minimal but conformant
  package (mimetype + manifest + content).
- xls: legacy BIFF8 inside an OLE2/CFB compound file (MS-XLS /
  MS-CFB public specs). Reader walks the FAT to extract the
  ``Workbook`` stream and decodes the record types real-world sheets
  use (SST/LABELSST/LABEL/NUMBER/RK/MULRK/BOOLERR/BLANK/MULBLANK);
  writer emits a minimal single-sheet BIFF8 workbook in a
  single-FAT CFB container (fixture/interop path, not a full Excel
  feature surface).
- excel-xml: SpreadsheetML 2003 (the reference's custom parser at
  ``/root/reference/dataflows/processors/parsers/excel_xml_parser.py:5-79``):
  SAX walk of Workbook/Worksheet/Table/Row/Cell/Data, first row =
  headers.
- gsheet: Google Sheets URL -> CSV export URL translation (the public
  ``/export?format=csv&gid=N`` endpoint); the fetch itself uses urllib
  so tests can exercise it offline via ``file://``.

Parity anchor: reference ``/root/reference/dataflows/processors/load.py:96-140``
registers these as tabulator formats/custom parsers.
"""

from __future__ import annotations

import io
import re
import struct
import zipfile
import xml.etree.ElementTree as ET
from typing import Any, Dict, List, Optional, Sequence, Tuple

Rows = List[List[Any]]

# ---------------------------------------------------------------------------
def _sheet_key(sheet) -> tuple:
    """Normalize a sheet selector: None -> first sheet; an int or a
    digit string -> 1-based index (the tabulator convention the
    reference's users expect); anything else -> exact name match.
    Returns ("index", i) / ("name", s) / ("first", None)."""
    if sheet is None:
        return ("first", None)
    if isinstance(sheet, int):
        return ("index", sheet)
    if isinstance(sheet, str) and sheet.isdigit():
        return ("index", int(sheet))
    return ("name", sheet)


def _sheet_matches(key: tuple, name, idx1: int) -> bool:
    kind, val = key
    if kind == "first":
        return idx1 == 1
    if kind == "index":
        return idx1 == val
    return name == val


# xlsx (ECMA-376 SpreadsheetML)
# ---------------------------------------------------------------------------

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKGREL = "http://schemas.openxmlformats.org/package/2006/relationships"


def _col_index(ref: str) -> int:
    """'C7' -> 2 (0-based column)."""
    n = 0
    for ch in ref:
        if ch.isdigit():
            break
        n = n * 26 + (ord(ch.upper()) - 64)
    return n - 1


def read_xlsx(path: str, sheet: Optional[str] = None) -> Rows:
    """All rows (lists of python values; sparse cells are None) of one
    worksheet. ``sheet`` = name, default the first sheet."""
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            r.get("Id"): r.get("Target")
            for r in rels.findall(f"{{{_NS_PKGREL}}}Relationship")}
        target = None
        key = _sheet_key(sheet)
        for _i, sh in enumerate(wb.find(f"{{{_NS_MAIN}}}sheets"), 1):
            if _sheet_matches(key, sh.get("name"), _i):
                target = rel_target[sh.get(f"{{{_NS_REL}}}id")]
                break
        if target is None:
            raise ValueError(f"xlsx: sheet {sheet!r} not found")
        if not target.startswith("/"):
            target = "xl/" + target
        else:
            target = target[1:]
        shared: List[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sst.findall(f"{{{_NS_MAIN}}}si"):
                shared.append("".join(
                    t.text or "" for t in si.iter(f"{{{_NS_MAIN}}}t")))
        ws = ET.fromstring(zf.read(target))
        out: Rows = []
        for row in ws.iter(f"{{{_NS_MAIN}}}row"):
            cells: List[Any] = []
            for c in row.findall(f"{{{_NS_MAIN}}}c"):
                idx = _col_index(c.get("r", ""))
                if idx < 0:
                    idx = len(cells)
                while len(cells) < idx:
                    cells.append(None)
                ctype = c.get("t", "n")
                v = c.find(f"{{{_NS_MAIN}}}v")
                if ctype == "inlineStr":
                    is_el = c.find(f"{{{_NS_MAIN}}}is")
                    val = "".join(t.text or "" for t in
                                  is_el.iter(f"{{{_NS_MAIN}}}t")) \
                        if is_el is not None else None
                elif v is None or v.text is None:
                    val = None
                elif ctype == "s":
                    val = shared[int(v.text)]
                elif ctype == "b":
                    val = v.text == "1"
                elif ctype == "str":
                    val = v.text
                else:  # numeric
                    f = float(v.text)
                    val = int(f) if f.is_integer() else f
                cells.append(val)
            out.append(cells)
        return out


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def _cell_ref(row: int, col: int) -> str:
    """(0, 0) -> 'A1'."""
    name = ""
    col += 1
    while col:
        col, rem = divmod(col - 1, 26)
        name = chr(65 + rem) + name
    return f"{name}{row + 1}"


def write_xlsx(path: str, rows: Rows, sheet_name: str = "Sheet1") -> None:
    """Minimal valid xlsx: one worksheet, inline strings, typed
    number/bool cells."""
    body = []
    for ri, row in enumerate(rows):
        cells = []
        for ci, val in enumerate(row):
            ref = _cell_ref(ri, ci)
            if val is None:
                continue
            if isinstance(val, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
            elif isinstance(val, (int, float)):
                cells.append(f'<c r="{ref}"><v>{val}</v></c>')
            else:
                cells.append(f'<c r="{ref}" t="inlineStr"><is><t '
                             f'xml:space="preserve">{_xml_escape(str(val))}'
                             f"</t></is></c>")
        body.append(f'<row r="{ri + 1}">' + "".join(cells) + "</row>")
    sheet_xml = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                 f'<worksheet xmlns="{_NS_MAIN}"><sheetData>'
                 + "".join(body) + "</sheetData></worksheet>")
    wb_xml = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_REL}"><sheets>'
              f'<sheet name="{_xml_escape(sheet_name)}" sheetId="1" '
              f'r:id="rId1"/></sheets></workbook>')
    wb_rels = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
               f'<Relationships xmlns="{_NS_PKGREL}">'
               f'<Relationship Id="rId1" Type="http://schemas.openxmlformats'
               f'.org/officeDocument/2006/relationships/worksheet" '
               f'Target="worksheets/sheet1.xml"/></Relationships>')
    root_rels = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                 f'<Relationships xmlns="{_NS_PKGREL}">'
                 f'<Relationship Id="rId1" Type="http://schemas.openxml'
                 f'formats.org/officeDocument/2006/relationships/office'
                 f'Document" Target="xl/workbook.xml"/></Relationships>')
    ctypes = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
              'content-types">'
              '<Default Extension="rels" ContentType="application/vnd.open'
              'xmlformats-package.relationships+xml"/>'
              '<Default Extension="xml" ContentType="application/xml"/>'
              '<Override PartName="/xl/workbook.xml" ContentType="applicati'
              'on/vnd.openxmlformats-officedocument.spreadsheetml.sheet.mai'
              'n+xml"/>'
              '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
              '"application/vnd.openxmlformats-officedocument.spreadsheetml'
              '.worksheet+xml"/></Types>')
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ctypes)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", wb_xml)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)


# ---------------------------------------------------------------------------
# ods (OASIS OpenDocument spreadsheet)
# ---------------------------------------------------------------------------

_NS_TABLE = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
_NS_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
_NS_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"


def read_ods(path: str, sheet: Optional[str] = None) -> Rows:
    """All rows of one ods sheet; typed cells via office:value-type,
    ``number-columns-repeated`` expanded (trailing filler trimmed)."""
    with zipfile.ZipFile(path) as zf:
        content = ET.fromstring(zf.read("content.xml"))
    tables = content.iter(f"{{{_NS_TABLE}}}table")
    table = None
    key = _sheet_key(sheet)
    for _i, t in enumerate(tables, 1):
        if _sheet_matches(key, t.get(f"{{{_NS_TABLE}}}name"), _i):
            table = t
            break
    if table is None:
        raise ValueError(f"ods: sheet {sheet!r} not found")
    out: Rows = []
    for row in table.findall(f"{{{_NS_TABLE}}}table-row"):
        cells: List[Any] = []
        for c in row.findall(f"{{{_NS_TABLE}}}table-cell"):
            rep = int(c.get(f"{{{_NS_TABLE}}}number-columns-repeated", "1"))
            rep = min(rep, 4096)  # filler columns guard
            vtype = c.get(f"{{{_NS_OFFICE}}}value-type")
            if vtype in ("float", "currency", "percentage"):
                f = float(c.get(f"{{{_NS_OFFICE}}}value"))
                val = int(f) if f.is_integer() else f
            elif vtype == "boolean":
                val = c.get(f"{{{_NS_OFFICE}}}boolean-value") == "true"
            elif vtype is not None:  # string / date / time as text
                val = "".join(p.text or "" for p in
                              c.findall(f"{{{_NS_TEXT}}}p")) or None
            else:
                val = None
            cells.extend([val] * rep)
        while cells and cells[-1] is None:  # trim repeated trailing filler
            cells.pop()
        if cells:
            out.append(cells)
    return out


def write_ods(path: str, rows: Rows, sheet_name: str = "Sheet1") -> None:
    body = []
    for row in rows:
        cells = []
        for val in row:
            if val is None:
                cells.append("<table:table-cell/>")
            elif isinstance(val, bool):
                cells.append(
                    f'<table:table-cell office:value-type="boolean" '
                    f'office:boolean-value="{str(val).lower()}">'
                    f"<text:p>{str(val).upper()}</text:p></table:table-cell>")
            elif isinstance(val, (int, float)):
                cells.append(
                    f'<table:table-cell office:value-type="float" '
                    f'office:value="{val}"><text:p>{val}</text:p>'
                    f"</table:table-cell>")
            else:
                cells.append(
                    f'<table:table-cell office:value-type="string">'
                    f"<text:p>{_xml_escape(str(val))}</text:p>"
                    f"</table:table-cell>")
        body.append("<table:table-row>" + "".join(cells)
                    + "</table:table-row>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{_NS_OFFICE}" '
        f'xmlns:table="{_NS_TABLE}" xmlns:text="{_NS_TEXT}" '
        'office:version="1.2"><office:body><office:spreadsheet>'
        f'<table:table table:name="{_xml_escape(sheet_name)}">'
        + "".join(body)
        + "</table:table></office:spreadsheet></office:body>"
          "</office:document-content>")
    manifest = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument'
        ':xmlns:manifest:1.0" manifest:version="1.2">'
        '<manifest:file-entry manifest:full-path="/" manifest:media-type='
        '"application/vnd.oasis.opendocument.spreadsheet"/>'
        '<manifest:file-entry manifest:full-path="content.xml" '
        'manifest:media-type="text/xml"/></manifest:manifest>')
    with zipfile.ZipFile(path, "w") as zf:
        # mimetype must be first and stored uncompressed per ODF spec
        zf.writestr(zipfile.ZipInfo("mimetype"),
                    "application/vnd.oasis.opendocument.spreadsheet",
                    compress_type=zipfile.ZIP_STORED)
        zf.writestr("content.xml", content, zipfile.ZIP_DEFLATED)
        zf.writestr("META-INF/manifest.xml", manifest, zipfile.ZIP_DEFLATED)


# ---------------------------------------------------------------------------
# excel-xml (SpreadsheetML 2003)
# ---------------------------------------------------------------------------

_NS_SS = "urn:schemas-microsoft-com:office:spreadsheet"


def read_excel_xml(path: str, sheet: Optional[str] = None) -> Rows:
    """SpreadsheetML 2003: Workbook/Worksheet/Table/Row/Cell/Data.
    Matches the reference parser's semantics (first table, cell text
    concatenated) with typed Data variants honored."""
    root = ET.parse(path).getroot()
    table = None
    key = _sheet_key(sheet)
    for _i, ws in enumerate(root.iter(f"{{{_NS_SS}}}Worksheet"), 1):
        if _sheet_matches(key, ws.get(f"{{{_NS_SS}}}Name"), _i):
            table = ws.find(f"{{{_NS_SS}}}Table")
            break
    if table is None:
        raise ValueError(f"excel-xml: sheet {sheet!r} not found")
    out: Rows = []
    for row in table.findall(f"{{{_NS_SS}}}Row"):
        cells: List[Any] = []
        for c in row.findall(f"{{{_NS_SS}}}Cell"):
            idx = c.get(f"{{{_NS_SS}}}Index")
            if idx is not None:
                while len(cells) < int(idx) - 1:
                    cells.append(None)
            data = c.find(f"{{{_NS_SS}}}Data")
            if data is None:
                cells.append(None)
                continue
            text = "".join(data.itertext())
            dtype = data.get(f"{{{_NS_SS}}}Type", "String")
            if dtype == "Number":
                f = float(text)
                cells.append(int(f) if f.is_integer() else f)
            elif dtype == "Boolean":
                cells.append(text == "1")
            else:
                cells.append(text)
        out.append(cells)
    return out


# ---------------------------------------------------------------------------
# gsheet
# ---------------------------------------------------------------------------

_GSHEET_RE = re.compile(
    r"docs\.google\.com/spreadsheets/d/(?P<key>[^/#?]+)")
_GID_RE = re.compile(r"[#?&]gid=(?P<gid>\d+)")


def gsheet_export_url(url: str) -> str:
    """Public Google Sheets share URL -> CSV export URL (the documented
    ``/export?format=csv[&gid=N]`` endpoint)."""
    m = _GSHEET_RE.search(url)
    if not m:
        raise ValueError(f"not a Google Sheets URL: {url}")
    out = (f"https://docs.google.com/spreadsheets/d/{m.group('key')}"
           f"/export?format=csv")
    gid = _GID_RE.search(url)
    if gid:
        out += f"&gid={gid.group('gid')}"
    return out


def fetch_gsheet_csv(url: str) -> bytes:
    """Resolve and download a Google Sheet as CSV bytes. ``file://`` and
    direct non-Google URLs pass through untranslated (offline tests)."""
    import urllib.request
    fetch = gsheet_export_url(url) if _GSHEET_RE.search(url) else url
    with urllib.request.urlopen(fetch) as resp:
        return resp.read()


# ---------------------------------------------------------------------------
# xls: OLE2/CFB container + BIFF8 records (MS-CFB, MS-XLS public specs)
# ---------------------------------------------------------------------------

_CFB_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


def _cfb_open_stream(raw: bytes, name: str) -> bytes:
    """Extract one stream from a compound file (512-byte sectors; both
    regular-FAT and miniFAT storage)."""
    if raw[:8] != _CFB_SIG:
        raise ValueError("not an OLE2 compound file")
    sector_size = 1 << struct.unpack_from("<H", raw, 30)[0]
    mini_size = 1 << struct.unpack_from("<H", raw, 32)[0]
    n_fat = struct.unpack_from("<I", raw, 44)[0]
    dir_start = struct.unpack_from("<i", raw, 48)[0]
    mini_cutoff = struct.unpack_from("<I", raw, 56)[0]
    minifat_start = struct.unpack_from("<i", raw, 60)[0]
    difat_start = struct.unpack_from("<i", raw, 68)[0]
    n_difat = struct.unpack_from("<I", raw, 72)[0]

    def sector(i: int) -> bytes:
        off = 512 + i * sector_size
        return raw[off:off + sector_size]

    # FAT sector list: 109 header DIFAT entries + chained DIFAT sectors
    fat_sectors = [struct.unpack_from("<i", raw, 76 + 4 * i)[0]
                   for i in range(109)]
    ds = difat_start
    for _ in range(n_difat):
        block = sector(ds)
        fat_sectors += [struct.unpack_from("<i", block, 4 * i)[0]
                        for i in range(sector_size // 4 - 1)]
        ds = struct.unpack_from("<i", block, sector_size - 4)[0]
    fat_sectors = [s for s in fat_sectors[:max(n_fat, 0) + 109]
                   if s >= 0][:n_fat]
    fat: List[int] = []
    for s in fat_sectors:
        blk = sector(s)
        fat += list(struct.unpack(f"<{sector_size // 4}i", blk))

    def chain(start: int) -> bytes:
        out, s, seen = [], start, set()
        while s >= 0 and s not in seen:
            seen.add(s)
            out.append(sector(s))
            s = fat[s]
        return b"".join(out)

    # directory entries (128 bytes each)
    dirdata = chain(dir_start)
    entries = []
    for off in range(0, len(dirdata) - 127, 128):
        nlen = struct.unpack_from("<H", dirdata, off + 64)[0]
        ename = dirdata[off:off + max(0, nlen - 2)].decode(
            "utf-16-le", "ignore")
        etype = dirdata[off + 66]
        estart = struct.unpack_from("<i", dirdata, off + 116)[0]
        esize = struct.unpack_from("<Q", dirdata, off + 120)[0]
        entries.append((ename, etype, estart, esize))
    root = next(e for e in entries if e[1] == 5)
    target = next((e for e in entries if e[0] == name and e[1] == 2), None)
    if target is None:
        raise ValueError(f"CFB stream {name!r} not found "
                         f"(have {[e[0] for e in entries if e[1] == 2]})")
    _n, _t, start, size = target
    if size >= mini_cutoff:
        return chain(start)[:size]
    # mini stream: FAT chain of the root entry holds the ministream bytes
    ministream = chain(root[2])[:root[3]]
    minifat: List[int] = []
    s = minifat_start
    seen = set()
    while s >= 0 and s not in seen:
        seen.add(s)
        blk = sector(s)
        minifat += list(struct.unpack(f"<{sector_size // 4}i", blk))
        s = fat[s]
    out, s2, seen2 = [], start, set()
    while s2 >= 0 and s2 not in seen2:
        seen2.add(s2)
        out.append(ministream[s2 * mini_size:(s2 + 1) * mini_size])
        s2 = minifat[s2]
    return b"".join(out)[:size]


def _rk_value(rk: int):
    """Decode a BIFF RK number (MS-XLS 2.5.276)."""
    mul100 = rk & 1
    if rk & 2:  # signed 30-bit int
        v = rk >> 2
        if v & (1 << 29):
            v -= 1 << 30
    else:       # high 30 bits of an IEEE double
        v = struct.unpack("<d", struct.pack("<Q", (rk & ~3) << 32))[0]
    if mul100:
        v = v / 100
        if isinstance(v, float) and v.is_integer():
            v = int(v)
    return v


def _parse_sst(data: bytes, n_strings: int, conts: List[bytes]) -> List[str]:
    """Shared-string table, handling CONTINUE records (each continuation
    restarts with its own grbit byte)."""
    bufs = [data] + conts
    bi, pos = 0, 8  # skip cstTotal/cstUnique
    out: List[str] = []

    def need(k: int) -> bytes:
        nonlocal bi, pos
        while pos >= len(bufs[bi]):
            bi += 1
            pos = 0
        # strings never split INSIDE the fixed header fields we read here
        chunk = bufs[bi][pos:pos + k]
        pos += k
        return chunk

    for _ in range(n_strings):
        cch = struct.unpack("<H", need(2))[0]
        grbit = need(1)[0]
        rich = struct.unpack("<H", need(2))[0] if grbit & 0x08 else 0
        ext = struct.unpack("<i", need(4))[0] if grbit & 0x04 else 0
        chars: List[str] = []
        remaining = cch
        wide = grbit & 0x01
        while remaining:
            avail = len(bufs[bi]) - pos
            if avail == 0:
                bi += 1
                pos = 0
                wide = bufs[bi][0] & 0x01  # continuation grbit
                pos = 1
                continue
            take = min(remaining, avail // 2 if wide else avail)
            if take == 0:  # odd trailing byte before a continue
                bi += 1
                pos = 0
                wide = bufs[bi][0] & 0x01
                pos = 1
                continue
            if wide:
                chars.append(bufs[bi][pos:pos + take * 2]
                             .decode("utf-16-le", "replace"))
                pos += take * 2
            else:
                chars.append(bufs[bi][pos:pos + take].decode("latin-1"))
                pos += take
            remaining -= take
        if rich:
            need(4 * rich)
        if ext:
            need(ext)
        out.append("".join(chars))
    return out


def _biff_string(data: bytes, offset: int) -> str:
    """XLUnicodeString at offset (LABEL record payloads)."""
    cch = struct.unpack_from("<H", data, offset)[0]
    grbit = data[offset + 2]
    if grbit & 1:
        return data[offset + 3:offset + 3 + cch * 2].decode(
            "utf-16-le", "replace")
    return data[offset + 3:offset + 3 + cch].decode("latin-1")


def read_xls(path: str, sheet: Optional[str] = None) -> Rows:
    """Cell grid of one BIFF8 worksheet (first sheet by default)."""
    with open(path, "rb") as f:
        raw = f.read()
    stream = None
    for name in ("Workbook", "Book"):
        try:
            stream = _cfb_open_stream(raw, name)
            break
        except ValueError:
            continue
    if stream is None:
        raise ValueError("xls: no Workbook stream")
    # record walk: globals substream (SST, BOUNDSHEET) then sheets
    pos = 0
    sst: List[str] = []
    sheets: List[Tuple[int, str]] = []  # (stream offset, name)
    records: List[Tuple[int, int, bytes]] = []
    while pos + 4 <= len(stream):
        rid, length = struct.unpack_from("<HH", stream, pos)
        data = stream[pos + 4:pos + 4 + length]
        records.append((pos, rid, data))
        pos += 4 + length
    by_pos = {p: i for i, (p, _r, _d) in enumerate(records)}
    for i, (p, rid, data) in enumerate(records):
        if rid == 0x00FC:  # SST
            n_unique = struct.unpack_from("<I", data, 4)[0]
            conts = []
            j = i + 1
            while j < len(records) and records[j][1] == 0x003C:  # CONTINUE
                conts.append(records[j][2])
                j += 1
            sst = _parse_sst(data, n_unique, conts)
        elif rid == 0x0085:  # BOUNDSHEET
            off = struct.unpack_from("<I", data, 0)[0]
            cch = data[6]
            grbit = data[7]
            nm = (data[8:8 + cch * 2].decode("utf-16-le", "replace")
                  if grbit & 1 else data[8:8 + cch].decode("latin-1"))
            sheets.append((off, nm))
    if not sheets:
        raise ValueError("xls: no sheets")
    key = _sheet_key(sheet)
    want = next(((off, nm) for _i, (off, nm) in enumerate(sheets, 1)
                 if _sheet_matches(key, nm, _i)), None)
    if want is None:
        raise ValueError(f"xls: sheet {sheet!r} not found")
    start_idx = by_pos.get(want[0])
    if start_idx is None:
        raise ValueError("xls: bad BOUNDSHEET offset")
    cells: Dict[Tuple[int, int], Any] = {}
    depth = 0
    for p, rid, data in records[start_idx:]:
        if rid == 0x0809:  # BOF
            depth += 1
        elif rid == 0x000A:  # EOF
            depth -= 1
            if depth <= 0:
                break
        elif rid == 0x00FD:  # LABELSST
            r, c, _xf, isst = struct.unpack_from("<HHHI", data, 0)
            cells[(r, c)] = sst[isst]
        elif rid == 0x0204:  # LABEL
            r, c = struct.unpack_from("<HH", data, 0)
            cells[(r, c)] = _biff_string(data, 6)
        elif rid == 0x0203:  # NUMBER
            r, c, _xf = struct.unpack_from("<HHH", data, 0)
            v = struct.unpack_from("<d", data, 6)[0]
            cells[(r, c)] = int(v) if v.is_integer() else v
        elif rid == 0x027E:  # RK
            r, c, _xf, rk = struct.unpack_from("<HHHI", data, 0)
            cells[(r, c)] = _rk_value(rk)
        elif rid == 0x00BD:  # MULRK
            r, c0 = struct.unpack_from("<HH", data, 0)
            n = (len(data) - 6) // 6
            for k in range(n):
                rk = struct.unpack_from("<I", data, 4 + 6 * k + 2)[0]
                cells[(r, c0 + k)] = _rk_value(rk)
        elif rid == 0x0205:  # BOOLERR
            r, c, _xf, val, is_err = struct.unpack_from("<HHHBB", data, 0)
            cells[(r, c)] = None if is_err else bool(val)
    if not cells:
        return []
    max_r = max(r for r, _c in cells)
    max_c = max(c for _r, c in cells)
    return [[cells.get((r, c)) for c in range(max_c + 1)]
            for r in range(max_r + 1)]


def _biff_record(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def write_xls(path: str, rows: Rows, sheet_name: str = "Sheet1") -> None:
    """Minimal single-sheet BIFF8 workbook in a CFB container. Strings
    are LABEL records (no SST), numbers are NUMBER records — the subset
    every BIFF8 reader (including ours and xlrd) accepts."""
    def unistr(s: str) -> bytes:
        enc = s.encode("utf-16-le")
        return struct.pack("<HB", len(s), 1) + enc

    sheet_recs = [_biff_record(0x0809, struct.pack(
        "<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0))]  # BOF worksheet
    for r, row in enumerate(rows):
        for c, val in enumerate(row):
            if val is None:
                continue
            if isinstance(val, bool):
                sheet_recs.append(_biff_record(0x0205, struct.pack(
                    "<HHHBB", r, c, 15, int(val), 0)))
            elif isinstance(val, (int, float)):
                sheet_recs.append(_biff_record(0x0203, struct.pack(
                    "<HHHd", r, c, 15, float(val))))
            else:
                sheet_recs.append(_biff_record(
                    0x0204, struct.pack("<HHH", r, c, 15)
                    + unistr(str(val))))
    sheet_recs.append(_biff_record(0x000A, b""))
    sheet_bytes = b"".join(sheet_recs)

    # globals substream; BOUNDSHEET needs the sheet's stream offset, which
    # depends on the globals' own length — compute with a placeholder pass
    def globals_bytes(sheet_off: int) -> bytes:
        recs = [
            _biff_record(0x0809, struct.pack(
                "<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0)),
            _biff_record(0x0085, struct.pack("<IBB", sheet_off, 0, 0)
                         + struct.pack("<B", len(sheet_name))
                         + struct.pack("<B", 1)
                         + sheet_name.encode("utf-16-le")),
            _biff_record(0x000A, b""),
        ]
        return b"".join(recs)

    glen = len(globals_bytes(0))
    workbook = globals_bytes(glen) + sheet_bytes
    _write_cfb(path, "Workbook", workbook)


def _write_cfb(path: str, stream_name: str, payload: bytes) -> None:
    """Single-stream compound file, 512-byte sectors, regular FAT only
    (payload padded past the 4096-byte mini cutoff so no miniFAT is
    needed)."""
    if len(payload) < 4096:
        payload = payload + b"\x00" * (4096 - len(payload))
    n_payload = (len(payload) + 511) // 512
    payload = payload.ljust(n_payload * 512, b"\x00")
    # sector layout: [0..n_payload) payload, [n_payload] directory, then FAT
    dir_sector = n_payload
    n_total = n_payload + 1  # + FAT sectors appended after computing count
    n_fat = 1
    while (n_total + n_fat) > (n_fat * 128):
        n_fat += 1
    fat = [-1] * ((n_total + n_fat + 127) // 128 * 128)
    for i in range(n_payload - 1):
        fat[i] = i + 1
    fat[n_payload - 1] = -2  # ENDOFCHAIN
    fat[dir_sector] = -2
    for k in range(n_fat):
        fat[n_total + k] = -3  # FATSECT marker
    fat_bytes = b"".join(struct.pack("<i", v) for v in fat)
    fat_bytes = fat_bytes[:n_fat * 512].ljust(n_fat * 512, b"\xff")

    def direntry(name: str, etype: int, start: int, size: int,
                 color: int = 1, child: int = -1) -> bytes:
        nm = name.encode("utf-16-le") + b"\x00\x00"
        return (nm.ljust(64, b"\x00")
                + struct.pack("<HBB", len(nm), etype, color)
                + struct.pack("<iii", -1, -1, child)
                + b"\x00" * 16 + b"\x00" * 4      # CLSID + state
                + b"\x00" * 16                     # timestamps
                + struct.pack("<iQ", start, size))

    directory = (direntry("Root Entry", 5, -2, 0, child=1)
                 + direntry(stream_name, 2, 0, len(payload), color=0)
                 + b"\x00" * 256)[:512]

    header = bytearray(512)
    header[0:8] = _CFB_SIG
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major (512-byte sectors)
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<H", header, 30, 9)        # sector shift
    struct.pack_into("<H", header, 32, 6)        # mini sector shift
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<i", header, 48, dir_sector)
    struct.pack_into("<I", header, 56, 4096)     # mini cutoff
    struct.pack_into("<i", header, 60, -2)       # no miniFAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<i", header, 68, -2)       # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into("<i", header, 76 + 4 * i,
                         n_total + i if i < n_fat else -1)
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(payload)
        f.write(directory)
        f.write(fat_bytes)
