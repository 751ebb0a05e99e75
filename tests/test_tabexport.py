"""--tab EXPORT sink (round 11): MySQL-dialect CREATE rendering checked
through the engine's OWN dump parser, and the full export → re-ingest
round trip (schema + data + restore.sql LOAD DATA statements)."""

from __future__ import annotations

from mysql2pg_spark.orchestrator import ColumnMeta, TableMeta
from mysql2pg_spark.sinks.ddl import FkSpec, IndexSpec
from mysql2pg_spark.sinks.tabexport import (
    export_tab_dir,
    render_mysql_create,
)

SF = "/root/testdata/sf0.001"


def _gnarly_table() -> TableMeta:
    return TableMeta(
        name="orders_x",
        columns=[
            ColumnMeta("id", "bigint", nullable=False,
                       auto_increment=True),
            ColumnMeta("name", "varchar(50)", default="it's",
                       comment="the user's name"),
            ColumnMeta("qty", "int", nullable=False, default="0"),
            ColumnMeta("ts", "datetime", default="CURRENT_TIMESTAMP"),
            ColumnMeta("note", "text"),
        ],
        primary_key=["id"],
        indexes=[
            IndexSpec("ix_name", ["name"], unique=False),
            IndexSpec("ux_name_qty", ["name", "qty"], unique=True),
        ],
        foreign_keys=[
            FkSpec("fk_parent", ["qty"], "parents", ["id"],
                   on_delete="CASCADE", on_update="SET NULL"),
        ],
    )


def test_render_create_roundtrips_through_own_parser(spark, tmp_path):
    """The emitted MySQL CREATE parses back through snapshot_from_dump
    with every column attribute, the PK, both keys and the FK intact —
    the renderer and the parser are exact inverses."""
    p = tmp_path / "t.sql"
    p.write_text(render_mysql_create(_gnarly_table()))
    from mysql2pg_spark.sources.dumpfile import snapshot_from_dump

    snap = snapshot_from_dump(spark, str(p))
    (t,) = snap.tables
    assert t.name == "orders_x"
    assert [(c.name, c.column_type, c.nullable, c.default,
             c.auto_increment, c.comment) for c in t.columns] == [
        ("id", "bigint", False, None, True, None),
        ("name", "varchar(50)", True, "it's", False, "the user's name"),
        ("qty", "int", False, "0", False, None),
        ("ts", "datetime", True, "CURRENT_TIMESTAMP", False, None),
        ("note", "text", True, None, False, None),
    ]
    assert t.primary_key == ["id"]
    assert [(i.name, i.columns, i.unique) for i in t.indexes] == [
        ("ix_name", ["name"], False),
        ("ux_name_qty", ["name", "qty"], True),
    ]
    (fk,) = t.foreign_keys
    assert (fk.columns, fk.ref_table, fk.ref_columns) == (
        ["qty"], "parents", ["id"]
    )
    assert fk.on_delete == "CASCADE" and fk.on_update == "SET NULL"


def test_export_reingest_roundtrip(spark, tmp_path):
    """Fixture tables exported to a --tab directory come back
    byte-identical through the directory source AND through the
    restore.sql LOAD DATA statements."""
    from mysql2pg_spark.sources.dumpfile import dump_read_schemas
    from mysql2pg_spark.sources.loaddata import (
        load_data_specs,
        read_load_data,
    )
    from mysql2pg_spark.sources.tabdump import (
        snapshot_from_tab_dir,
        tab_source_reader,
    )
    from mysql2pg_spark.tables import load_table

    spark_to_mysql = {
        "bigint": "bigint", "int": "int", "double": "double",
        "string": "varchar(200)", "timestamp": "datetime",
        "timestamp_ntz": "datetime", "date": "date",
    }
    tables = []
    frames = {}
    for name in ("nation", "supplier"):
        df = load_table(spark, SF, name)
        frames[name] = df
        tables.append(TableMeta(
            name=name,
            columns=[
                ColumnMeta(f.name,
                           spark_to_mysql[f.dataType.simpleString()])
                for f in df.schema.fields
            ],
        ))

    class Snap:
        pass

    snap = Snap()
    snap.tables = tables
    out = str(tmp_path / "export")
    res = export_tab_dir(
        spark, snap, out, lambda t: frames[t],
        field_term=",", enclosed_by='"',
    )
    assert sorted(res["tables"]) == ["nation", "supplier"]

    # path 1: the --tab directory source (schema halves through the
    # dump parser, data through read_tab_dump) — needs the same format
    # options the export used
    snap2 = snapshot_from_tab_dir(spark, out)
    assert {t.name for t in snap2.tables} == {"nation", "supplier"}
    schemas = dump_read_schemas(snap2)

    # path 2: the restore.sql LOAD DATA statements drive the read with
    # the export's own recorded options — fully self-describing
    specs = {s.table: s for s in load_data_specs(res["restore_script"])}
    assert specs["nation"].field_term == ","
    assert specs["nation"].enclosed_by == '"'
    for name in ("nation", "supplier"):
        got = read_load_data(
            spark, specs[name], schemas[name], base_dir=out
        )
        want = {tuple(r) for r in frames[name].collect()}
        have = {tuple(r) for r in got.collect()}
        assert have == want, name


def test_cli_tabexport_from_dump_roundtrip(spark, tmp_path, capsys):
    """CLI surface: a single-file dump exports to a --tab directory
    whose schema halves re-parse and whose restore.sql reloads the
    identical rows through the LOAD DATA source."""
    import json

    import yaml

    from mysql2pg_spark.__main__ import main
    from mysql2pg_spark.sources.dumpfile import dump_read_schemas
    from mysql2pg_spark.sources.loaddata import (
        load_data_specs,
        read_load_data,
    )
    from mysql2pg_spark.sources.tabdump import snapshot_from_tab_dir

    dump = tmp_path / "src.sql"
    dump.write_text(
        "CREATE TABLE `kv` (\n"
        "  `k` int NOT NULL,\n"
        "  `v` varchar(40) DEFAULT NULL,\n"
        "  PRIMARY KEY (`k`)\n"
        ");\n"
        "INSERT INTO `kv` VALUES (1,'a\\tb'),(2,NULL),(3,'c,d');\n"
    )
    cfgp = tmp_path / "cfg.yml"
    cfgp.write_text(yaml.safe_dump({
        "mysql": {"host": "h", "database": "d"},
        "postgresql": {"host": "p", "database": "d"},
        "conversion": {"options": {}, "limits": {}},
    }))
    out = tmp_path / "export"
    rc = main([
        "-c", str(cfgp), "--mode", "tabexport",
        "--dump-file", str(dump), "--tab-out", str(out),
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["tables"] == ["kv"]

    snap2 = snapshot_from_tab_dir(spark, str(out))
    (t,) = snap2.tables
    assert t.name == "kv" and t.primary_key == ["k"]
    (spec,) = load_data_specs(res["restore_script"])
    got = {
        tuple(r)
        for r in read_load_data(
            spark, spec, dump_read_schemas(snap2)["kv"],
            base_dir=str(out),
        ).collect()
    }
    assert got == {(1, "a\tb"), (2, None), (3, "c,d")}


def test_render_create_keeps_index_kind_checks_partition(spark, tmp_path):
    """ADVICE r11: FULLTEXT/SPATIAL keys, CHECK constraints and the
    partition clause must survive a dump→export→re-ingest loop —
    round 11 taught the PARSER to keep them, round 12 the renderer."""
    t = TableMeta(
        name="rich",
        columns=[
            ColumnMeta("id", "int", nullable=False),
            ColumnMeta("body", "text"),
            ColumnMeta("loc", "point", nullable=False),
            ColumnMeta("yr", "int"),
        ],
        indexes=[
            IndexSpec("ft_body", ["body"], kind="fulltext"),
            IndexSpec("sp_loc", ["loc"], kind="spatial"),
        ],
    )
    t.checks = [("chk_pos", "`id` > 0", True), (None, "`yr` > 1900", False)]
    t.partition_def = (
        "PARTITION BY RANGE (yr) "
        "(PARTITION p0 VALUES LESS THAN (2000), "
        "PARTITION p1 VALUES LESS THAN MAXVALUE)"
    )
    text = render_mysql_create(t)
    assert "FULLTEXT KEY `ft_body` (`body`)" in text
    assert "SPATIAL KEY `sp_loc` (`loc`)" in text
    assert "CONSTRAINT `chk_pos` CHECK (`id` > 0)" in text
    assert "CHECK (`yr` > 1900) NOT ENFORCED" in text
    assert ") PARTITION BY RANGE (yr)" in text

    p = tmp_path / "rich.sql"
    p.write_text(text)
    from mysql2pg_spark.sources.dumpfile import snapshot_from_dump

    (back,) = snapshot_from_dump(spark, str(p)).tables
    assert {i.name: i.kind for i in back.indexes} == {
        "ft_body": "fulltext", "sp_loc": "spatial"
    }
    assert [(n, e) for n, e, _ in back.checks] == [
        ("chk_pos", "`id` > 0"), (None, "`yr` > 1900")
    ]
    assert [enf for _, _, enf in back.checks] == [True, False]
    assert "p0" in back.partition_def and "MAXVALUE" in back.partition_def


def test_export_excludes_generated_columns(spark, tmp_path):
    """ADVICE r11: real MySQL rejects explicit values for generated
    columns (ERROR 3105) — the export writes only the plain columns and
    the restore LOAD DATA names them explicitly."""
    from mysql2pg_spark.orchestrator import CatalogSnapshot
    from mysql2pg_spark.sources.loaddata import load_data_specs

    t = TableMeta(
        name="gen_t",
        columns=[
            ColumnMeta("a", "int", nullable=False),
            ColumnMeta("b", "int", generated_expr="`a` * 2",
                       generated_stored=True),
            ColumnMeta("c", "varchar(10)"),
        ],
    )
    snap = CatalogSnapshot(tables=[t])
    df = spark.createDataFrame([(1, 2, "x"), (3, 6, "y")], "a int, b int, c string")
    out = tmp_path / "tab"
    export_tab_dir(spark, snap, str(out), lambda name: df)
    specs = load_data_specs(str(out / "restore.sql"))
    (spec,) = specs
    assert spec.columns == ["a", "c"]
    # the data files carry two fields per row, not three
    import glob

    parts = glob.glob(str(out / "gen_t.txt" / "part-*"))
    assert parts
    # rows may land in any part file (the rest are empty) — check every
    # data line, wherever it landed
    lines = [
        ln.rstrip("\n")
        for p in parts
        for ln in open(p)
        if ln.strip()
    ]
    assert len(lines) == 2
    assert all(ln.count("\t") == 1 for ln in lines)
