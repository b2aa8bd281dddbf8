"""Lotus 1-2-3 .wk1/.wks spreadsheet source (sources/wk1.py)."""

import struct

import pytest

from architxt_spark.sources.wk1 import make_wk1_bytes, read_wk1_rows

GRID = [
    ["name", "qty", "price"],
    ["widget", 4, 2.5],
    ["gädget", -31000, 19.875],
]


def test_wk1_roundtrip_header_and_types():
    got = read_wk1_rows(make_wk1_bytes(GRID))
    assert got == {"Sheet1": [
        {"name": "widget", "qty": "4", "price": "2.5"},
        {"name": "gädget", "qty": "-31000", "price": "19.875"},
    ]}


def test_wk1_formula_cached_values_and_number_records():
    # numbers in a formula column travel as FORMULA records — only the
    # cached-result read path can produce them; int_cells=False forces
    # float64 NUMBER records for integral values
    got = read_wk1_rows(
        make_wk1_bytes(GRID, formula_cols=frozenset({1}), int_cells=False)
    )
    assert got["Sheet1"][0] == {"name": "widget", "qty": "4", "price": "2.5"}
    assert got["Sheet1"][1]["qty"] == "-31000"


def test_wk1_label_prefixes_stripped_and_wks_version():
    for prefix in (b"'", b'"', b"^", b"\\"):
        for version in (0x0404, 0x0405, 0x0406):
            got = read_wk1_rows(
                make_wk1_bytes(GRID, label_prefix=prefix, version=version)
            )
            assert got["Sheet1"][0]["name"] == "widget", (prefix, version)


def test_wk1_string_formula_result_record():
    # a 0x33 STRING record (string formula cached result) reads like a
    # label, prefix included
    body = struct.pack("<BHH", 0xF1, 0, 0) + b"'hdr\x00"
    cell = struct.pack("<BHH", 0xF1, 0, 1) + b"'out\x00"
    blob = (
        struct.pack("<HHH", 0x0000, 2, 0x0406)
        + struct.pack("<HH", 0x000F, len(body)) + body
        + struct.pack("<HH", 0x0033, len(cell)) + cell
        + struct.pack("<HH", 0x0001, 0)
    )
    assert read_wk1_rows(blob) == {"Sheet1": [{"hdr": "out"}]}


def test_wk1_gates_and_errors():
    with pytest.raises(ValueError, match="missing BOF"):
        read_wk1_rows(b"\x99 garbage")
    with pytest.raises(ValueError, match="BOF version"):
        read_wk1_rows(struct.pack("<HHH", 0, 2, 0x0099))
    with pytest.raises(NotImplementedError, match="release 3"):
        read_wk1_rows(struct.pack("<HHH", 0, 2, 0x1000))
    # records after EOF are ignored
    blob = make_wk1_bytes([["h"], ["x"]]) + b"\x0f\x00\x08\x00junkjunk"
    assert read_wk1_rows(blob) == {"Sheet1": [{"h": "x"}]}


def test_wk1_volume_fuzz():
    import random

    rng = random.Random(0x123)
    for trial in range(150):
        ncols = rng.randint(1, 6)
        header = [f"c{i}" for i in range(ncols)]
        rows, want = [header], []
        for _ in range(rng.randint(0, 8)):
            row, wrow = [], {}
            for i, h in enumerate(header):
                kind = rng.randrange(4)
                if kind == 0:
                    v = "".join(
                        rng.choice("ab éß~") for _ in range(rng.randint(0, 9))
                    )
                    row.append(v)
                    wrow[h] = v
                elif kind == 1:
                    v = rng.randint(-32768, 32767)
                    row.append(v)
                    wrow[h] = str(v)
                elif kind == 2:
                    v = rng.randint(-(10**9), 10**9) / 64.0
                    row.append(v)
                    wrow[h] = (
                        str(int(v)) if float(v).is_integer() else repr(v)
                    )
                else:
                    row.append(None)  # gap: absent record
            rows.append(row)
            # an all-gap row emits no cell records at all, so (like the
            # xlsx/ods shape) it contributes no output record
            if wrow:
                want.append(wrow)
        fcols = frozenset(
            i for i in range(ncols) if rng.random() < 0.3
        )
        got = read_wk1_rows(
            make_wk1_bytes(
                rows,
                formula_cols=fcols,
                int_cells=bool(rng.randrange(2)),
                version=rng.choice((0x0404, 0x0406)),
            )
        )
        assert got == {"Sheet1": want}, (trial, rows, got)


def test_read_document_file_wk1_end_to_end(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file

    p = tmp_path / "t.wk1"
    p.write_bytes(make_wk1_bytes(GRID))
    nodes = read_document_file(spark, str(p))
    vals = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
    assert "widget" in vals and "gädget" in vals


def test_wk1_corruption_never_crashes_unexpectedly():
    """Truncations and byte flips of a valid worksheet must either
    parse (possibly partially) or raise ValueError/NotImplementedError
    — never an IndexError/struct.error escape."""
    import random

    from architxt_spark.sources.wk1 import make_wk1_bytes, read_wk1_rows

    rng = random.Random(7)
    base = bytearray(make_wk1_bytes(GRID, formula_cols=frozenset({1})))
    for trial in range(400):
        blob = bytearray(base)
        if trial % 2:
            blob = blob[: rng.randrange(len(blob) + 1)]
        for _ in range(rng.randrange(3)):
            if blob:
                blob[rng.randrange(len(blob))] = rng.randrange(256)
        try:
            read_wk1_rows(bytes(blob))
        except (ValueError, NotImplementedError):
            pass
