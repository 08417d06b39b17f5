"""Source readers: CSV/JSON round-trips with explicit schemas; the
JDBC/Kafka edges raise their gated errors cleanly in this container."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.sources.readers import (
    read_csv,
    read_jdbc,
    read_json,
    read_kafka_batch,
)

SCHEMA = "id int, name string, amount double"


def test_csv_round_trip_explicit_schema(spark, tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("id,name,amount\n1,a,1.5\n2,b,2.5\n")
    df = read_csv(spark, str(p), schema=SCHEMA)
    assert df.schema.simpleString() == "struct<id:int,name:string,amount:double>"
    assert {(r.id, r.name, r.amount) for r in df.collect()} == {(1, "a", 1.5), (2, "b", 2.5)}


def test_json_round_trip_explicit_schema(spark, tmp_path):
    p = tmp_path / "j.json"
    p.write_text('{"id": 1, "name": "a", "amount": 1.5}\n{"id": 2, "name": "b", "amount": 2.5}\n')
    df = read_json(spark, str(p), schema=SCHEMA)
    assert df.count() == 2
    assert df.filter("amount > 2").collect()[0].name == "b"


def test_jdbc_gated_error(spark):
    with pytest.raises((RuntimeError, ValueError)):
        read_jdbc(
            spark,
            url="jdbc:mysql://nowhere:3306/db",
            table="t",
            driver="com.mysql.cj.jdbc.Driver",
        )
    # bounds validation fires before any connection attempt
    with pytest.raises(ValueError):
        read_jdbc(
            spark,
            url="jdbc:mysql://nowhere:3306/db",
            table="t",
            driver="com.mysql.cj.jdbc.Driver",
            partition_column="id",
        )


def test_kafka_gated_error(spark):
    with pytest.raises(RuntimeError):
        read_kafka_batch(spark, "nowhere:9092", "topic")


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC round-trips losslessly and, like parquet, serves filters
    through the columnar reader (search-argument pushdown)."""
    from data_lakehouse_platform_spark.catalog import load_table
    from data_lakehouse_platform_spark.sources.readers import read_orc
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    path = str(tmp_path / "orders_orc")
    orders.write.orc(path)
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    assert sorted(back.columns) == sorted(orders.columns)
    want = orders.filter("o_orderstatus = 'F'").count()
    assert read_orc(spark, path).filter("o_orderstatus = 'F'").count() == want


def test_text_reader_line_and_wholefile(spark, tmp_path):
    from data_lakehouse_platform_spark.sources.readers import read_text

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("single doc body\nacross two lines\n")

    lines = read_text(spark, str(d))
    assert sorted(r["value"] for r in lines.collect()) == [
        "across two lines", "line one", "line two", "single doc body",
    ]
    docs = read_text(spark, str(d), whole_file=True)
    assert docs.count() == 2
    assert any("across two lines" in r["value"] for r in docs.collect())


def test_csv_malformed_row_handling(spark, tmp_path):
    """Bronze-ingest robustness: PERMISSIVE mode quarantines malformed
    rows into a corrupt-record column (auditable, nothing dropped
    silently); FAILFAST refuses the file outright."""
    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,qty,price\n"
        "1,2,9.5\n"
        "2,notanumber,1.0\n"  # qty fails to parse
        "3,4,2.5\n"
    )
    schema = "id long, qty long, price double, _corrupt string"
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema(schema)
        .csv(str(p))
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt"] is None]
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert len(good) == 2 and len(bad) == 1
    assert bad[0]["qty"] is None and "notanumber" in bad[0]["_corrupt"]

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError  # noqa: F401

    strict = (
        spark.read.option("header", True)
        .option("mode", "FAILFAST")
        .schema("id long, qty long, price double")
        .csv(str(p))
    )
    with _pytest.raises(Exception, match="Malformed|FAILFAST|BadRecord"):
        strict.collect()


def test_xml_roundtrip_with_schema(spark, tmp_path):
    """Spark 4 built-in XML source: schema-explicit read of rowTag
    elements, write-then-read round-trip preserves values."""
    from data_lakehouse_platform_spark.sources.readers import read_xml, write_xml

    src = tmp_path / "feed.xml"
    src.write_text(
        "<orders>"
        "<o><id>1</id><sku>widget</sku><qty>3</qty></o>"
        "<o><id>2</id><sku>gadget</sku><qty>5</qty></o>"
        "</orders>"
    )
    df = read_xml(spark, str(src), row_tag="o", schema="id long, sku string, qty long")
    rows = {r["id"]: (r["sku"], r["qty"]) for r in df.collect()}
    assert rows == {1: ("widget", 3), 2: ("gadget", 5)}

    out = tmp_path / "out-xml"
    write_xml(df, str(out), row_tag="o")
    back = read_xml(spark, str(out), row_tag="o", schema="id long, sku string, qty long")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_python_datasource_docsgen(spark):
    """Spark 4 Python Data Source API: the synthetic-corpus generator
    registers as a real format — partitioned scan, deterministic rows
    (pure function of doc_id), filter/agg compose like any table."""
    from data_lakehouse_platform_spark.sources.docsgen import (
        DocsGenDataSource,
        _doc_row,
    )

    spark.dataSource.register(DocsGenDataSource)
    df = (
        spark.read.format("docsgen")
        .option("n_docs", 200)
        .option("n_partitions", 4)
        .load()
    )
    assert df.columns == ["doc_id", "text", "lang", "n_chars"]
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 4
    # deterministic: the scan yields exactly the pure-function rows
    got = {r["doc_id"]: (r["text"], r["lang"], r["n_chars"]) for r in df.collect()}
    for i in (0, 7, 199):
        assert got[i] == _doc_row(i)[1:]
    # composes with ordinary relational ops
    by_lang = {r["lang"]: r["n"] for r in df.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert sum(by_lang.values()) == 200 and set(by_lang) <= {"en", "de", "fr", "es"}
    # rereading with the same options gives identical rows (no RNG state)
    again = spark.read.format("docsgen").option("n_docs", 200).option(
        "n_partitions", 4).load()
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in df.collect()}


def test_persistent_catalog_tables(spark, tmp_path):
    """Metastore-backed catalog: testdata registered as persistent
    tables survives as named SQL objects (database, listTables,
    cross-table joins) — the shared-catalog workflow a lakehouse
    deployment uses instead of per-session temp views."""
    from data_lakehouse_platform_spark.catalog import load_table
    from tests.conftest import SF_DIR

    db = "lake_it"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    try:
        load_table(spark, SF_DIR, "nation").write.mode("overwrite").saveAsTable(
            f"{db}.nation"
        )
        load_table(spark, SF_DIR, "region").write.mode("overwrite").saveAsTable(
            f"{db}.region"
        )
        names = {t.name for t in spark.catalog.listTables(db)}
        assert {"nation", "region"} <= names
        got = spark.sql(
            f"""SELECT r.r_name, COUNT(*) AS n
                FROM {db}.nation n JOIN {db}.region r ON n.n_regionkey = r.r_regionkey
                GROUP BY r.r_name ORDER BY r.r_name"""
        ).collect()
        assert sum(r["n"] for r in got) == 25 and len(got) == 5
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_json_quarantine_split(spark, tmp_path):
    """PERMISSIVE ingest: good rows flow with the business schema, bad
    raw lines land in quarantine — nothing fails, nothing vanishes."""
    from data_lakehouse_platform_spark.sources.readers import (
        read_json_with_quarantine,
    )

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"k": 1, "v": "ok"}\n'
        "{not json at all}\n"
        '{"k": 2, "v": "fine"}\n'
        '{"k": "NaNope", "v": 3}\n'  # type mismatch -> corrupt
    )
    good, quarantine = read_json_with_quarantine(
        spark, str(p), "k bigint, v string"
    )
    assert sorted((r.k, r.v) for r in good.collect()) == [
        (1, "ok"),
        (2, "fine"),
    ]
    raw = [r.raw_line for r in quarantine.collect()]
    assert len(raw) == 2
    assert any("not json" in s for s in raw)
    assert all(isinstance(s, str) for s in raw)
