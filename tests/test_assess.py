"""Assessment-engine tests: scoring constants, penalty math, roll-up shape
(reference semantics: db2ice/assessor.py:152-517)."""

from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.assess import (
    PENALTIES,
    WEIGHTS,
    Assessor,
    assess_ddl,
    score_to_level,
)
from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.model import (
    ReadinessLevel,
    Severity,
)

from fixtures import DB2_CORPUS


def test_constants_match_reference():
    assert WEIGHTS == {"datatype": 0.40, "constraint": 0.20,
                       "partition": 0.15, "special": 0.25}
    assert PENALTIES["editproc"] == 50
    assert PENALTIES["fieldproc"] == 50
    assert PENALTIES["validproc"] == 40
    assert PENALTIES["unsupported_type"] == 25
    assert PENALTIES["lossy_conversion"] == 10
    assert PENALTIES["compatible_type"] == 2


def test_traffic_light_thresholds():
    assert score_to_level(80) == ReadinessLevel.GREEN
    assert score_to_level(79.9) == ReadinessLevel.YELLOW
    assert score_to_level(50) == ReadinessLevel.YELLOW
    assert score_to_level(49.9) == ReadinessLevel.RED


def test_clean_table_scores_100():
    report = Assessor().assess(
        "CREATE TABLE S.CLEAN (A INTEGER NOT NULL, B VARCHAR(10), C DATE, "
        "PRIMARY KEY (A));")
    ta = report.table_assessments[0]
    assert ta.readiness_score == 100
    assert ta.can_auto_convert
    assert report.overall_level == ReadinessLevel.GREEN


def test_xml_blocks_auto_convert():
    report = Assessor().assess("CREATE TABLE S.X (A INTEGER, B XML);")
    ta = report.table_assessments[0]
    assert not ta.can_auto_convert
    assert ta.readiness_score == 100 - PENALTIES["unsupported_type"]
    assert report.tables_blocked == 1
    assert any(i.severity == Severity.CRITICAL for i in ta.issues)


def test_proc_penalties_accumulate():
    report = Assessor().assess(
        "CREATE TABLE S.P (A INTEGER, B CHAR(5) FIELDPROC F1) "
        "EDITPROC E1 VALIDPROC V1;")
    ta = report.table_assessments[0]
    # CHAR compatible(2) + fieldproc(50) + editproc(50) + validproc(40) > 100
    assert ta.readiness_score == 0
    assert ta.readiness_level == ReadinessLevel.RED
    assert not ta.can_auto_convert


def test_partition_kinds_score_differently():
    hash_rep = Assessor().assess(
        "CREATE TABLE S.H (A INTEGER, B DATE) PARTITION BY HASH (A);")
    range_rep = Assessor().assess(
        "CREATE TABLE S.R (A INTEGER, B DATE) PARTITION BY RANGE (B);")
    assert hash_rep.table_assessments[0].readiness_score == 100 - PENALTIES[
        "complex_partition"]
    assert range_rep.table_assessments[0].readiness_score == 100  # info only
    assert range_rep.partition_score == 90  # info partition issue costs 10


def test_empty_input_is_critical():
    report = Assessor().assess("-- nothing here")
    assert report.tables_total == 0
    assert report.critical_issues[0].code == "SSC-EWI-DB2ICE-0000"


def test_corpus_rollup_shape():
    d = assess_ddl(DB2_CORPUS)
    assert d["summary"]["tables_total"] == 13
    assert (d["summary"]["tables_auto_convert"]
            + d["summary"]["tables_manual_review"]
            + d["summary"]["tables_blocked"]) == 13
    assert d["summary"]["tables_blocked"] >= 2  # XML table + proc table
    assert d["inventory"]["total_columns"] > 40
    assert set(d["readiness"]) == {"overall_score", "overall_level",
                                   "datatype_score", "constraint_score",
                                   "partition_score", "special_features_score"}
    assert d["features_used"]["editproc"] == 1
    assert d["features_used"]["fieldproc"] == 1
    assert d["features_used"]["xml_columns"] == 1
    assert d["features_used"]["generated_columns"] == 2
    assert d["features_used"]["partitioning"] == 2
    assert d["type_distribution"]["INTEGER"] > 5


def test_weighted_overall_score():
    rep = Assessor().assess("CREATE TABLE S.W (A XML);")
    expected = (rep.datatype_score * 0.40 + rep.constraint_score * 0.20
                + rep.partition_score * 0.15 + rep.special_features_score * 0.25)
    assert abs(rep.overall_score - expected) < 1e-9
