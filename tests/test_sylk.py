"""SYLK .slk spreadsheet source (sources/sylk.py)."""

import pytest

from architxt_spark.sources.sylk import make_slk_bytes, read_slk_rows

GRID = [
    ["name", "qty", "note"],
    ["widget", 4, "semi;colon"],
    ["gadget", 2.5, "plain"],
]


def test_slk_roundtrip_escapes_and_persisting_coords():
    got = read_slk_rows(make_slk_bytes(GRID))
    assert got == {"Sheet1": [
        {"name": "widget", "qty": "4", "note": "semi;colon"},
        {"name": "gadget", "qty": "2.5", "note": "plain"},
    ]}
    # explicit Y on every record reads the same
    assert read_slk_rows(make_slk_bytes(GRID, omit_repeat_y=False)) == got


def test_slk_booleans_and_not_sylk():
    blob = b"ID;PWXL\r\nC;Y1;X1;K\"flag\"\r\nC;Y2;X1;KTRUE\r\nE\r\n"
    assert read_slk_rows(blob) == {"Sheet1": [{"flag": "True"}]}
    with pytest.raises(ValueError, match="not a SYLK"):
        read_slk_rows(b"not;a;sylk\r\n")


def test_slk_volume_fuzz():
    import random

    rng = random.Random(0x51)
    for trial in range(120):
        ncols = rng.randint(1, 5)
        header = [f"c{i}" for i in range(ncols)]
        rows, want = [header], []
        for _ in range(rng.randint(0, 6)):
            row, wrow = [], {}
            for h in header:
                kind = rng.randrange(4)
                if kind == 0:
                    v = "".join(rng.choice('ab;"é ') for _ in range(rng.randint(1, 8)))
                    row.append(v)
                    wrow[h] = v
                elif kind == 1:
                    v = rng.randint(-99999, 99999)
                    row.append(v)
                    wrow[h] = str(v)
                elif kind == 2:
                    v = rng.randint(-(10**6), 10**6) / 32.0
                    row.append(v)
                    wrow[h] = str(int(v)) if float(v).is_integer() else repr(v)
                else:
                    row.append(None)
            rows.append(row)
            if wrow:
                want.append(wrow)
        got = read_slk_rows(
            make_slk_bytes(rows, omit_repeat_y=bool(rng.randrange(2)))
        )
        assert got == {"Sheet1": want}, (trial, rows, got)


def test_read_document_file_slk_end_to_end(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file

    p = tmp_path / "t.slk"
    p.write_bytes(make_slk_bytes(GRID))
    nodes = read_document_file(spark, str(p))
    vals = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
    assert "widget" in vals and "semi;colon" in vals


def test_slk_corruption_never_crashes_unexpectedly():
    import random

    from architxt_spark.sources.sylk import make_slk_bytes, read_slk_rows

    rng = random.Random(9)
    base = bytearray(make_slk_bytes(GRID))
    for trial in range(400):
        blob = bytearray(base)
        if trial % 2:
            blob = blob[: rng.randrange(len(blob) + 1)]
        for _ in range(rng.randrange(3)):
            if blob:
                blob[rng.randrange(len(blob))] = rng.randrange(256)
        try:
            read_slk_rows(bytes(blob))
        except (ValueError, NotImplementedError):
            pass
