"""CLI smoke tests (driver-only paths; migrate is covered by
test_catalog_spark's migrate tests at the API level)."""

import json

import pytest

from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.__main__ import main

DDL = """
CREATE TABLE SALES.CUSTOMER (
  CUST_ID INTEGER NOT NULL,
  NAME VARCHAR(100),
  DOC XML,
  PRIMARY KEY (CUST_ID)
);
"""


@pytest.fixture()
def ddl_file(tmp_path):
    p = tmp_path / "schema.sql"
    p.write_text(DDL)
    return str(p)


def test_assess_prints_json(ddl_file, capsys):
    assert main(["assess", ddl_file]) == 0
    report = json.loads(capsys.readouterr().out)
    assert report["summary"]["tables_total"] == 1


def test_convert_emits_iceberg(ddl_file, capsys):
    assert main(["convert", ddl_file]) == 0
    out = capsys.readouterr().out
    assert "CREATE OR REPLACE ICEBERG TABLE" in out
    assert "CUST_ID" in out


def test_convert_to_file(ddl_file, tmp_path, capsys):
    out = str(tmp_path / "out.sql")
    assert main(["convert", ddl_file, "-o", out]) == 0
    assert "ICEBERG TABLE" in open(out).read()


def test_convert_snowflake_dialect(tmp_path, capsys):
    p = tmp_path / "sf.sql"
    p.write_text("CREATE OR REPLACE TABLE DB.S.T (ID NUMBER(10,0), V VARIANT);")
    assert main(["convert", "--dialect", "snowflake", str(p)]) == 0
    out = capsys.readouterr().out
    assert "ICEBERG TABLE" in out


def test_assess_empty_fails(tmp_path, capsys):
    p = tmp_path / "empty.sql"
    p.write_text("-- nothing here")
    assert main(["assess", str(p)]) == 1
