"""Hypothesis fuzz for the schema plane: generated DDL must round-trip
parse → map → assess → convert without crashes, with structural invariants
holding for any input the grammar can produce. (The reference ships zero
tests — SURVEY.md §5; property fuzzing is our substitute for its missing
robustness story.)"""

from hypothesis import given, settings
from hypothesis import strategies as st

from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.assess import Assessor
from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.convert import (
    IcebergDdlGenerator,
)
from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.mapping import (
    map_db2_type,
)

IDENT = st.from_regex(r"[A-Z][A-Z0-9_]{0,15}", fullmatch=True)

PLAIN_TYPES = st.sampled_from([
    "SMALLINT", "INTEGER", "INT", "BIGINT", "REAL", "DOUBLE", "DATE",
    "BOOLEAN", "XML", "ROWID", "CLOB", "BLOB", "DBCLOB", "LONG VARCHAR",
])
PARAM_TYPES = st.one_of(
    st.tuples(st.sampled_from(["CHAR", "VARCHAR", "BINARY", "VARBINARY",
                               "GRAPHIC", "VARGRAPHIC"]),
              st.integers(1, 40_000_000)).map(lambda t: f"{t[0]}({t[1]})"),
    st.tuples(st.just("DECIMAL"), st.integers(1, 60), st.integers(0, 30))
    .map(lambda t: f"DECIMAL({t[1]},{min(t[2], t[1])})"),
    st.tuples(st.sampled_from(["TIMESTAMP", "TIME"]), st.integers(0, 12))
    .map(lambda t: f"{t[0]}({t[1]})"),
    st.tuples(st.just("FLOAT"), st.integers(1, 53)).map(
        lambda t: f"FLOAT({t[1]})"),
    st.tuples(st.just("DECFLOAT"), st.sampled_from([16, 34])).map(
        lambda t: f"DECFLOAT({t[1]})"),
)
COL_TYPE = st.one_of(PLAIN_TYPES, PARAM_TYPES)

MODIFIER = st.sampled_from([
    "", " NOT NULL", " NOT NULL DEFAULT 0", " FOR BIT DATA",
    " GENERATED ALWAYS AS IDENTITY", " CCSID 1208",
])


@st.composite
def create_table(draw):
    schema = draw(IDENT)
    name = draw(IDENT)
    ncols = draw(st.integers(1, 8))
    cols = []
    names = set()
    for _ in range(ncols):
        cn = draw(IDENT.filter(lambda s: s not in names))
        names.add(cn)
        ct = draw(COL_TYPE)
        mod = draw(MODIFIER) if "CHAR" in ct or "INT" in ct else ""
        cols.append(f"{cn} {ct}{mod}")
    pk = f", PRIMARY KEY ({next(iter(names))})" if draw(st.booleans()) else ""
    return f"CREATE TABLE {schema}.{name} (\n  " + ",\n  ".join(cols) + pk + "\n);"


@given(st.lists(create_table(), min_size=1, max_size=4).map("\n".join))
@settings(max_examples=60, deadline=None)
def test_parse_map_assess_convert_never_crashes(ddl):
    report = Assessor().assess(ddl)
    assert 0 <= report.overall_score <= 100
    assert report.tables_total >= 1
    result = IcebergDdlGenerator().convert(ddl)
    assert result.success
    # every parsed table produced a DDL statement
    assert result.iceberg_ddl.count("CREATE OR REPLACE") >= report.tables_total


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=500))
@settings(max_examples=80, deadline=None)
def test_arbitrary_text_never_crashes_parser(garbage):
    """Garbage in → empty-or-partial catalog out, never an exception."""
    report_ok = True
    try:
        Assessor().parser.parse(garbage)
    except Exception:
        report_ok = False
    assert report_ok


SF_TYPES = st.sampled_from([
    "NUMBER(38,0)", "VARCHAR(100)", "STRING", "VARIANT", "OBJECT", "ARRAY",
    "GEOGRAPHY", "TIMESTAMP_NTZ", "TIMESTAMP_LTZ", "TIMESTAMP_TZ",
    "DATETIME", "BOOLEAN", "DATE", "FLOAT",
])
SF_TABLE_KIND = st.sampled_from([
    "", "TRANSIENT ", "TEMPORARY ", "DYNAMIC ", "EXTERNAL ", "HYBRID ",
])


@st.composite
def sf_create_table(draw):
    kind = draw(SF_TABLE_KIND)
    db, schema, name = draw(IDENT), draw(IDENT), draw(IDENT)
    ncols = draw(st.integers(1, 6))
    names = set()
    cols = []
    for _ in range(ncols):
        cn = draw(IDENT.filter(lambda s: s not in names))
        names.add(cn)
        mod = draw(st.sampled_from(
            ["", " NOT NULL", " DEFAULT 0", " COMMENT 'c'",
             " IDENTITY(1,1)"]))
        cols.append(f"{cn} {draw(SF_TYPES)}{mod}")
    cluster = f" CLUSTER BY ({next(iter(names))})" \
        if draw(st.booleans()) and not kind.strip() else ""
    return (f"CREATE OR REPLACE {kind}TABLE {db}.{schema}.{name} (\n  "
            + ",\n  ".join(cols) + f"\n){cluster};")


@given(st.lists(sf_create_table(), min_size=1, max_size=3).map("\n".join))
@settings(max_examples=50, deadline=None)
def test_snowflake_convert_never_crashes(ddl):
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.convert import (
        SnowflakeToIcebergGenerator,
    )

    result = SnowflakeToIcebergGenerator().convert(ddl)
    assert result.success
    # every table is either converted, kept-as-standard, or skipped with
    # an issue — none silently vanish
    n_tables = ddl.count("CREATE OR REPLACE")
    emitted = (result.iceberg_ddl.count("CREATE OR REPLACE")
               + result.iceberg_ddl.count("TABLE SKIPPED"))
    assert emitted >= n_tables


@given(st.sampled_from(["CHAR", "VARCHAR", "DECIMAL", "TIMESTAMP", "TIME",
                        "FLOAT", "UNKNOWN_TYPE", "DECFLOAT"]),
       st.integers(0, 100_000_000), st.integers(0, 100), st.integers(0, 50))
@settings(max_examples=200, deadline=None)
def test_mapper_is_total(base, length, precision, scale):
    """map_type is a total function over its domain: always returns a
    target type, a status, and caps NUMBER precision at 38."""
    m = map_db2_type(base, length=length or None,
                     precision=precision or None,
                     scale=scale or None)
    assert m.target_type
    assert m.status is not None
    if m.target_type.startswith("NUMBER("):
        p = int(m.target_type.split("(")[1].split(",")[0])
        assert p <= 38
