"""Minimal XLSX reader (first-party, replaces openpyxl/pandas.read_excel).

Only needs to read data/roads_parameters.xlsx — a single-sheet table with
header row (columns 'GDB-Code', 'Type', 'to keep', 'Definition', 'Width';
reference prepare_data_obj_detec.py:99,:106-109)."""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _col_index(ref: str) -> int:
    """'C7' -> 2 (zero-based column)."""
    letters = re.match(r"([A-Z]+)", ref).group(1)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def read_xlsx(path: str, sheet: int = 0, header: int = 0) -> pd.DataFrame:
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append("".join(t.text or ""
                                      for t in si.iter(
                                          f"{{{_NS['m']}}}t")))
        sheets = sorted(n for n in z.namelist()
                        if re.match(r"xl/worksheets/sheet\d+\.xml$", n))
        root = ET.fromstring(z.read(sheets[sheet]))

    rows: dict[int, dict[int, object]] = {}
    maxcol = 0
    for row in root.iter(f"{{{_NS['m']}}}row"):
        r = int(row.get("r")) - 1
        for c in row.findall("m:c", _NS):
            ref = c.get("r")
            ci = _col_index(ref) if ref else 0
            t = c.get("t", "n")
            v = c.find("m:v", _NS)
            if v is None:
                is_ = c.find("m:is", _NS)
                val = ("".join(e.text or "" for e in is_.iter(
                    f"{{{_NS['m']}}}t")) if is_ is not None else None)
            elif t == "s":
                val = shared[int(v.text)]
            elif t == "b":
                val = bool(int(v.text))
            elif t == "str":
                val = v.text
            else:
                try:
                    fv = float(v.text)
                    val = int(fv) if fv.is_integer() else fv
                except (TypeError, ValueError):
                    val = v.text
            rows.setdefault(r, {})[ci] = val
            maxcol = max(maxcol, ci)

    if not rows:
        return pd.DataFrame()
    nrows = max(rows) + 1
    grid = [[rows.get(r, {}).get(c) for c in range(maxcol + 1)]
            for r in range(nrows)]
    headers = [h if h is not None else f"Unnamed: {i}"
               for i, h in enumerate(grid[header])]
    body = grid[header + 1:]
    df = pd.DataFrame(body, columns=headers)
    # numeric columns with missing cells -> float with NaN (pandas behaviour)
    for col in df.columns:
        s = df[col]
        if s.map(lambda x: x is None or isinstance(x, (int, float))).all():
            has_none = s.isna().any() or s.map(lambda x: x is None).any()
            if s.map(lambda x: isinstance(x, (int, float))).any():
                df[col] = s.map(
                    lambda x: np.nan if x is None else float(x)
                    if has_none or isinstance(x, float) else x)
    return df


def read_excel(path: str, *args, **kwargs) -> pd.DataFrame:
    return read_xlsx(path)
