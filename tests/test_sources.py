"""Loader tests — golden fixtures from the reference test suite
(``tests/database/test_read_database.py``, ``tests/database/test_read_documents.py``)."""

import json

import pytest

from architxt_spark.sources.documents import (
    parse_document_forest,
    read_document_value,
    read_documents_df,
    row_trees,
)
from architxt_spark.sources.relational import FK, get_root_tables, is_association_table, read_relational
from architxt_spark.trees import format_tree, parse_tree, rows_to_trees


# --- documents (golden: tests/database/test_read_documents.py:6-32) ---

@pytest.mark.parametrize(
    ("tree", "expected"),
    [
        ("(ROOT )", []),
        ("(name (ENT::A x) (ENT::B y))", ["(GROUP::name (ENT::A x) (ENT::B y))"]),
        ("(COLL::A (ENT::A x) (ENT::A y))", ["(GROUP::A (ENT::A x))", "(GROUP::A (ENT::A y))"]),
        (
            "(name (ENT::A x) (sub (ENT::B y)))",
            ["(ROOT (REL::name<->sub (GROUP::name (ENT::A x)) (GROUP::sub (ENT::B y))))"],
        ),
    ],
)
def test_parse_document_tree(tree, expected):
    got = [format_tree(t) for t in parse_document_forest(parse_tree(tree))]
    assert got == [format_tree(parse_tree(e)) for e in expected]


def test_read_document_value_scalar_list():
    # top-level array of scalar objects → one tree per element
    forest = read_document_value([{"A": "x"}, {"A": "y"}])
    assert [format_tree(t) for t in forest] == [
        "(GROUP::root (ENT::a x))",
        "(GROUP::root (ENT::a y))",
    ]


def test_read_document_value_names_normalized():
    forest = read_document_value({"My Name": {"Some Key": "v"}})
    assert "GROUP::my_name" in format_tree(forest[0])
    assert "ENT::some_key" in format_tree(forest[0])


def test_read_documents_df(spark):
    docs = [(1, json.dumps({"name": {"A": "x", "B": "y"}}))]
    df = spark.createDataFrame(docs, "id int, payload string")
    nodes = read_documents_df(df, "payload", "id")
    trees = rows_to_trees([r.asDict(recursive=True) for r in nodes.collect()])
    # The top-level dict gets the document-root wrapper group (read_tree
    # lowercases root_name → 'root'), so the nested dict becomes a relation.
    assert [format_tree(t) for t in trees.values()] == [
        "(ROOT (REL::root<->name (GROUP::root ) (GROUP::name (ENT::a x) (ENT::b y))))"
    ]


def test_row_trees(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], "k int, v string")
    nodes = row_trees(df, "tbl", ["k"])
    trees = rows_to_trees([r.asDict(recursive=True) for r in nodes.collect()])
    strs = sorted(format_tree(t) for t in trees.values())
    assert strs == [
        "(ROOT (GROUP::tbl (ENT::k 1) (ENT::v a)))",
        "(ROOT (GROUP::tbl (ENT::k 2)))",
    ]


# --- relational (golden: tests/database/test_read_database.py:17-116) ---

@pytest.fixture(scope="module")
def f1_tables(spark):
    product = spark.createDataFrame(
        [(1, "Laptop", 1000), (2, "Smartphone", 500)], "id int, name string, price int"
    )
    consumer = spark.createDataFrame(
        [(1, "Alice", 30), (2, "Bob", 25), (3, "Charles", 35), (4, "David", 40)],
        "id int, name string, age int",
    )
    order = spark.createDataFrame(
        [(1, 1, 2), (2, 2, 1), (1, 2, 1)], "product_id int, consumer_id int, quantity int"
    )
    tables = {"Product": product, "Consumer": consumer, "Order": order}
    fks = [FK("Order", "product_id", "Product", "id"), FK("Order", "consumer_id", "Consumer", "id")]
    pks = {"Product": ["id"], "Consumer": ["id"], "Order": ["product_id", "consumer_id"]}
    return tables, fks, pks


EXPECTED_ORDER_TREES = {
    "(ROOT (GROUP::Order (ENT::quantity 2)) (REL::Order<->Consumer (GROUP::Order (ENT::quantity 2)) (GROUP::Consumer (ENT::id 1) (ENT::name Alice) (ENT::age 30))) (GROUP::Consumer (ENT::id 1) (ENT::name Alice) (ENT::age 30)) (REL::Order<->Product (GROUP::Order (ENT::quantity 2)) (GROUP::Product (ENT::id 1) (ENT::name Laptop) (ENT::price 1000))) (GROUP::Product (ENT::id 1) (ENT::name Laptop) (ENT::price 1000)))",
    "(ROOT (GROUP::Order (ENT::quantity 1)) (REL::Order<->Consumer (GROUP::Order (ENT::quantity 1)) (GROUP::Consumer (ENT::id 2) (ENT::name Bob) (ENT::age 25))) (GROUP::Consumer (ENT::id 2) (ENT::name Bob) (ENT::age 25)) (REL::Order<->Product (GROUP::Order (ENT::quantity 1)) (GROUP::Product (ENT::id 2) (ENT::name Smartphone) (ENT::price 500))) (GROUP::Product (ENT::id 2) (ENT::name Smartphone) (ENT::price 500)))",
    "(ROOT (GROUP::Order (ENT::quantity 1)) (REL::Order<->Consumer (GROUP::Order (ENT::quantity 1)) (GROUP::Consumer (ENT::id 2) (ENT::name Bob) (ENT::age 25))) (GROUP::Consumer (ENT::id 2) (ENT::name Bob) (ENT::age 25)) (REL::Order<->Product (GROUP::Order (ENT::quantity 1)) (GROUP::Product (ENT::id 1) (ENT::name Laptop) (ENT::price 1000))) (GROUP::Product (ENT::id 1) (ENT::name Laptop) (ENT::price 1000)))",
}

EXPECTED_UNREFERENCED = {
    "(ROOT (GROUP::Consumer (ENT::id 3) (ENT::name Charles) (ENT::age 35)))",
    "(ROOT (GROUP::Consumer (ENT::id 4) (ENT::name David) (ENT::age 40)))",
}


@pytest.mark.parametrize("include_unreferenced", [True, False])
def test_read_relational_golden(spark, f1_tables, include_unreferenced):
    tables, fks, pks = f1_tables
    nodes = read_relational(spark, tables, fks, pks, search_all_instances=include_unreferenced)
    trees = rows_to_trees([r.asDict(recursive=True) for r in nodes.collect()])
    got = {format_tree(t) for t in trees.values()}
    expected = set(EXPECTED_ORDER_TREES)
    if include_unreferenced:
        expected |= EXPECTED_UNREFERENCED
    assert got == expected


def test_oid_determinism(spark, f1_tables):
    tables, fks, pks = f1_tables
    a = read_relational(spark, tables, fks, pks)
    b = read_relational(spark, tables, fks, pks)
    ids_a = {r["node_id"] for r in a.collect()}
    ids_b = {r["node_id"] for r in b.collect()}
    assert ids_a == ids_b  # deterministic OIDs → idempotent re-load


def test_root_and_association_detection():
    fks = [FK("Order", "product_id", "Product", "id"), FK("Order", "consumer_id", "Consumer", "id")]
    assert get_root_tables(["Product", "Consumer", "Order"], fks) == ["Order"]
    pks = {"Assoc": ["a_id", "b_id"]}
    afks = [FK("Assoc", "a_id", "A", "id"), FK("Assoc", "b_id", "B", "id")]
    assert is_association_table("Assoc", pks, afks, 2)
    assert not is_association_table("Order", {"Order": ["product_id", "consumer_id"]}, fks, 3)


def test_association_collapse(spark):
    a = spark.createDataFrame([(1, "x")], "id int, v string")
    b = spark.createDataFrame([(7, "y")], "id int, w string")
    assoc = spark.createDataFrame([(1, 7)], "a_id int, b_id int")
    tables = {"A": a, "B": b, "Assoc": assoc}
    fks = [FK("Assoc", "a_id", "A", "id"), FK("Assoc", "b_id", "B", "id")]
    pks = {"A": ["id"], "B": ["id"], "Assoc": ["a_id", "b_id"]}
    nodes = read_relational(spark, tables, fks, pks)
    trees = rows_to_trees([r.asDict(recursive=True) for r in nodes.collect()])
    got = [format_tree(t) for t in trees.values()]
    assert got == [
        "(ROOT (REL::A<->B (GROUP::A (ENT::id 1) (ENT::v x)) (GROUP::B (ENT::id 7) (ENT::w y))))"
    ]


def test_nested_fk_walk(spark):
    """root → A → B recursion flattens under ROOT with a shared visited-edge set."""
    region = spark.createDataFrame([(1, "EU")], "id int, rname string")
    nation = spark.createDataFrame([(10, "FR", 1)], "id int, nname string, region_id int")
    cust = spark.createDataFrame([(100, "Zoe", 10)], "id int, cname string, nation_id int")
    tables = {"Region": region, "Nation": nation, "Cust": cust}
    fks = [FK("Cust", "nation_id", "Nation", "id"), FK("Nation", "region_id", "Region", "id")]
    pks = {"Region": ["id"], "Nation": ["id"], "Cust": ["id"]}
    nodes = read_relational(spark, tables, fks, pks)
    trees = rows_to_trees([r.asDict(recursive=True) for r in nodes.collect()])
    (t,) = trees.values()
    s = format_tree(t)
    assert s == (
        "(ROOT (GROUP::Cust (ENT::id 100) (ENT::cname Zoe))"
        " (REL::Cust<->Nation (GROUP::Cust (ENT::id 100) (ENT::cname Zoe)) (GROUP::Nation (ENT::id 10) (ENT::nname FR)))"
        " (GROUP::Nation (ENT::id 10) (ENT::nname FR))"
        " (REL::Nation<->Region (GROUP::Nation (ENT::id 10) (ENT::nname FR)) (GROUP::Region (ENT::id 1) (ENT::rname EU)))"
        " (GROUP::Region (ENT::id 1) (ENT::rname EU)))"
    )


# --- multi-format document file loader (parser chain, loader/documents.py:22-29) ---

def test_read_document_file_json(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file

    p = tmp_path / "doc.json"
    p.write_text('[{"name": "alice", "age": "3"}, {"name": "bob", "age": "5"}]')
    nodes = read_document_file(spark, str(p))
    groups = nodes.filter(nodes.node_type == "GROUP")
    assert groups.count() == 2


def test_read_document_file_csv(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file

    p = tmp_path / "doc.csv"
    p.write_text("name,age\nalice,3\nbob,5\n")
    nodes = read_document_file(spark, str(p))
    ents = {r["node_name"] for r in nodes.filter(nodes.node_type == "ENT").collect()}
    assert ents == {"name", "age"}
    assert nodes.filter(nodes.node_type == "GROUP").count() == 2


def test_read_document_file_toml(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file

    p = tmp_path / "doc.toml"
    p.write_text('[server]\nhost = "a"\nport = "80"\n')
    nodes = read_document_file(spark, str(p))
    assert nodes.filter(nodes.node_type == "ENT").count() == 2


def test_read_document_file_xml(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file

    p = tmp_path / "doc.xml"
    p.write_text("<people><person><name>alice</name></person><person><name>bob</name></person></people>")
    nodes = read_document_file(spark, str(p))
    leaves = {r["leaf_value"] for r in nodes.filter(nodes.leaf_value.isNotNull()).collect()}
    assert {"alice", "bob"} <= leaves


def test_read_document_file_yaml(spark, tmp_path):
    import pytest

    from architxt_spark.sources.documents import read_document_file

    pytest.importorskip("yaml")
    p = tmp_path / "doc.yaml"
    p.write_text("people:\n  - name: alice\n  - name: bob\n")
    nodes = read_document_file(spark, str(p))
    assert nodes.filter(nodes.node_type == "GROUP").count() == 2


def _write_xlsx(path, sheets):
    """Hand-rolled minimal xlsx (zip of spreadsheetml XML parts): shared
    strings for every cell unless a (type, raw) tuple overrides it."""
    import zipfile

    MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    RELNS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    PKG = "http://schemas.openxmlformats.org/package/2006/relationships"
    strings, sidx = [], {}

    def sref(v):
        if v not in sidx:
            sidx[v] = len(strings)
            strings.append(v)
        return sidx[v]

    def colletter(i):
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(65 + r) + s
        return s

    sheet_parts = []
    for rows in sheets.values():
        rws = []
        for rnum, row in enumerate(rows, 1):
            cells = []
            for ci, v in enumerate(row):
                if v is None:
                    continue
                ref = f"{colletter(ci)}{rnum}"
                if isinstance(v, tuple):  # (cell_type, raw_xml_value)
                    t, raw = v
                    if t == "inlineStr":
                        cells.append(f'<c r="{ref}" t="inlineStr"><is><t>{raw}</t></is></c>')
                    else:
                        cells.append(f'<c r="{ref}" t="{t}"><v>{raw}</v></c>')
                else:
                    cells.append(f'<c r="{ref}" t="s"><v>{sref(v)}</v></c>')
            rws.append(f'<row r="{rnum}">{"".join(cells)}</row>')
        sheet_parts.append(
            f'<worksheet xmlns="{MAIN}"><sheetData>{"".join(rws)}</sheetData></worksheet>'
        )

    sheet_decls = "".join(
        f'<sheet name="{name}" sheetId="{i+1}" r:id="rId{i+1}"/>'
        for i, name in enumerate(sheets)
    )
    rels = "".join(
        f'<Relationship Id="rId{i+1}" Type="{RELNS}/worksheet"'
        f' Target="worksheets/sheet{i+1}.xml"/>'
        for i in range(len(sheets))
    )
    sst = "".join(f"<si><t>{s}</t></si>" for s in strings)
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr(
            "xl/workbook.xml",
            f'<workbook xmlns="{MAIN}" xmlns:r="{RELNS}">'
            f"<sheets>{sheet_decls}</sheets></workbook>",
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<Relationships xmlns="{PKG}">{rels}</Relationships>',
        )
        z.writestr("xl/sharedStrings.xml", f'<sst xmlns="{MAIN}">{sst}</sst>')
        for i, part in enumerate(sheet_parts):
            z.writestr(f"xl/worksheets/sheet{i+1}.xml", part)


def _shape(nodes):
    return sorted(
        (r["node_type"] or "", r["node_name"] or "", r["leaf_value"] or "")
        for r in nodes.collect()
    )


def test_read_document_file_xlsx_matches_json_equivalent(spark, tmp_path):
    """Golden: the stdlib xlsx reader produces the SAME forest shape as
    the JSON loader fed the equivalent {sheet: [records]} document — the
    parser chain's contract (reference ``loader/documents.py:22-29``)."""
    from architxt_spark.sources.documents import read_document_file

    x = tmp_path / "doc.xlsx"
    _write_xlsx(x, {"people": [["name", "age"], ["alice", "3"], ["bob", "5"]]})
    j = tmp_path / "doc.json"
    j.write_text(
        '{"people": [{"name": "alice", "age": "3"},'
        ' {"name": "bob", "age": "5"}]}'
    )
    assert _shape(read_document_file(spark, str(x))) == _shape(
        read_document_file(spark, str(j))
    )


def test_read_document_file_xlsx_cell_types_and_sparse_rows(spark, tmp_path):
    """Inline strings, booleans, raw numbers, multi-sheet, and sparse
    rows (missing cells = absent record keys, like the reference's
    NaN-dropping)."""
    from architxt_spark.sources.documents import read_document_file

    p = tmp_path / "typed.xlsx"
    _write_xlsx(
        p,
        {
            "people": [
                ["name", "ok", "score"],
                [("inlineStr", "carol"), ("b", "1"), ("n", "42")],
                ["dave", None, ("n", "7.5")],  # sparse: no 'ok' cell
            ],
            "places": [["city"], ["paris"]],
        },
    )
    nodes = read_document_file(spark, str(p))
    leaves = {r["leaf_value"] for r in nodes.filter(nodes.leaf_value.isNotNull()).collect()}
    assert {"carol", "True", "42", "dave", "7.5", "paris"} <= leaves
    ents = {r["node_name"] for r in nodes.filter(nodes.node_type == "ENT").collect()}
    assert ents == {"name", "ok", "score", "city"}
    # dave's missing 'ok' cell must not synthesize an entity
    dave_ok = nodes.filter(
        (nodes.node_type == "ENT") & (nodes.leaf_value == "None")
    )
    assert dave_ok.count() == 0


def test_read_document_file_xls_corrupt_raises(spark, tmp_path):
    """.xls now reads with the stdlib BIFF8 parser (r10, sources/xls.py,
    tests/test_xls.py); a corrupt container still fails loudly."""
    import pytest

    from architxt_spark.sources.documents import read_document_file

    p = tmp_path / "doc.xls"
    p.write_bytes(b"\xd0\xcf\x11\xe0 legacy biff")  # magic but no body
    with pytest.raises(ValueError, match="OLE2"):
        read_document_file(spark, str(p))
