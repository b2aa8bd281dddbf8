"""dBASE .dbf table source (sources/dbf.py)."""

import pytest

from architxt_spark.sources.dbf import make_dbf_bytes, read_dbf_rows

FIELDS = [("NAME", "C", 12), ("AGE", "N", 5), ("ACTIVE", "L", 1), ("BORN", "D", 8)]
ROWS = [
    ["Alice", 30, "T", "1994-02-01"],
    ["Bob café", 7, "N", "2018-12-31"],
]


def test_dbf_roundtrip_types_and_deleted_records():
    blob = make_dbf_bytes(FIELDS, ROWS + [["Gone", 1, "T", "2000-01-01"]],
                          deleted={2})
    got = read_dbf_rows(blob)
    assert got == {"Table1": [
        {"NAME": "Alice", "AGE": "30", "ACTIVE": "True", "BORN": "1994-02-01"},
        {"NAME": "Bob café", "AGE": "7", "ACTIVE": "False", "BORN": "2018-12-31"},
    ]}


def test_dbf_codepage_via_language_driver():
    # cp866 (DOS Cyrillic) text must decode through the LDID byte
    blob = make_dbf_bytes([("GOROD", "C", 10)], [["Москва"]], ldid=0x65)
    assert read_dbf_rows(blob) == {"Table1": [{"GOROD": "Москва"}]}


def test_dbf_errors_and_unknown_type_passthrough():
    with pytest.raises(ValueError, match="not a .dbf"):
        read_dbf_rows(b"\x99 garbage")
    # an unknown field type surfaces as trimmed text, never data loss
    blob = make_dbf_bytes([("X", "Q", 6)], [["weird"]])
    assert read_dbf_rows(blob) == {"Table1": [{"X": "weird"}]}


def test_dbf_volume_fuzz():
    import random

    rng = random.Random(0xDBF)
    for trial in range(150):
        n_fields = rng.randint(1, 6)
        fields = []
        for i in range(n_fields):
            t = rng.choice(["C", "N", "L", "D"])
            w = {"C": rng.randint(1, 20), "N": rng.randint(3, 10),
                 "L": 1, "D": 8}[t]
            fields.append((f"F{i}", t, w))
        rows, want = [], []
        dels = set()
        for r in range(rng.randint(0, 8)):
            row, wrow = [], {}
            for name, t, w in fields:
                if t == "C":
                    v = "".join(rng.choice("ab éß ") for _ in range(rng.randint(0, w)))
                    row.append(v)
                    wrow[name] = v.rstrip()
                elif t == "N":
                    v = rng.randint(0, 10 ** (w - 1) - 1)
                    row.append(v)
                    wrow[name] = str(v)
                elif t == "L":
                    v = rng.choice(["T", "F", "?"])
                    row.append(v)
                    wrow[name] = {"T": "True", "F": "False", "?": ""}[v]
                else:
                    y, m, d = rng.randint(1900, 2099), rng.randint(1, 12), rng.randint(1, 28)
                    row.append(f"{y:04d}-{m:02d}-{d:02d}")
                    wrow[name] = f"{y:04d}-{m:02d}-{d:02d}"
            if rng.random() < 0.2:
                dels.add(r)
            else:
                want.append(wrow)
            rows.append(row)
        got = read_dbf_rows(make_dbf_bytes(fields, rows, deleted=dels))
        assert got == {"Table1": want}, (trial, fields, rows, got)


def test_read_document_file_dbf_end_to_end(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file

    p = tmp_path / "t.dbf"
    p.write_bytes(make_dbf_bytes(FIELDS, ROWS))
    nodes = read_document_file(spark, str(p))
    vals = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
    assert "Alice" in vals and "Bob café" in vals


def test_dbf_foxpro_and_memo_version_bytes_accepted():
    # Visual FoxPro (0x30) and the memo variants (0x83/0x8B/0xF5) are
    # the same record layout for our purposes
    for ver in (0x30, 0x31, 0x83, 0x8B, 0xF5):
        blob = bytearray(make_dbf_bytes([("A", "C", 4)], [["ok"]]))
        blob[0] = ver
        assert read_dbf_rows(bytes(blob)) == {"Table1": [{"A": "ok"}]}, hex(ver)
