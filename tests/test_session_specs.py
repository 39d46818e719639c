"""Session-file → TableSpec generation + shard-config parity tests.

Mirrors the reference's SchemaTest.java (mappings, verify error paths),
ShardSpecTest.java (2 hosts × 16 shards naming), and the
TableSpecList.getFromSessionFile partition-key walk / SQL generation.
"""

from __future__ import annotations

import json

import pytest

from spanner_data_validator_spark.sources.session_file import (
    DroppedTableError,
    determine_partition_key,
    parse_session,
    read_session_file,
    table_specs_from_session,
)
from spanner_data_validator_spark.sources.shard_config import (
    read_sharding_config,
    resolve_password,
    shard_specs_from_def,
)
from spanner_data_validator_spark.sources.tablespec import (
    QueryTableSpec,
    generate_table_specs,
    specs_from_json,
    specs_from_json_file,
    specs_to_json_file,
)


# --------------------------------------------------------------------------
# session fixture: cart/people (SchemaTest.java:116-195) + a BIGINT-PK table
# --------------------------------------------------------------------------

def _session_dict():
    return {
        "SpSchema": {
            "t1": {
                "Name": "new_cart",
                "ColIds": ["c1", "c2", "c3"],
                "ColDefs": {
                    "c1": {"Name": "new_product_id", "T": {"Name": "STRING"}},
                    "c2": {"Name": "new_quantity", "T": {"Name": "INT64"}},
                    "c3": {"Name": "new_user_id", "T": {"Name": "STRING"}},
                },
                "PrimaryKeys": [{"ColId": "c3", "Order": 1}, {"ColId": "c1", "Order": 2}],
                "ShardIdColumn": "",
            },
            "t2": {
                "Name": "new_people",
                "ColIds": ["c5", "c6"],
                "ColDefs": {
                    "c5": {"Name": "new_name", "T": {"Name": "STRING"}},
                    "c6": {"Name": "synth_id", "T": {"Name": "INT64"}},
                },
                "PrimaryKeys": [{"ColId": "c6", "Order": 1}],
            },
            "t4": {
                "Name": "member_events",
                "ColIds": ["c7", "c8", "c9"],
                "ColDefs": {
                    "c7": {"Name": "id", "T": {"Name": "INT64"}},
                    "c8": {"Name": "eventCode", "T": {"Name": "STRING"}},
                    "c9": {"Name": "synthCol", "T": {"Name": "STRING"}},
                },
                "PrimaryKeys": [{"ColId": "c7", "Order": 1}],
            },
        },
        "SrcSchema": {
            "t1": {
                "Name": "cart",
                "Schema": "my_schema",
                "ColIds": ["c3", "c1", "c2"],
                "ColDefs": {
                    "c1": {"Name": "product_id", "Type": {"Name": "varchar"}},
                    "c2": {"Name": "quantity", "Type": {"Name": "bigint"}},
                    "c3": {"Name": "user_id", "Type": {"Name": "varchar"}},
                },
                "PrimaryKeys": [{"ColId": "c3", "Order": 1}, {"ColId": "c1", "Order": 2}],
            },
            "t2": {
                "Name": "people",
                "Schema": "my_schema",
                "ColIds": ["c5"],
                "ColDefs": {"c5": {"Name": "name", "Type": {"Name": "varchar"}}},
                "PrimaryKeys": None,
            },
            "t3": {
                "Name": "droppedTableName",
                "Schema": "my_schema",
                "ColIds": ["c6x"],
                "ColDefs": {"c6x": {"Name": "name", "Type": {"Name": "varchar"}}},
                "PrimaryKeys": None,
            },
            "t4": {
                "Name": "member_events",
                "Schema": "my_schema",
                "ColIds": ["c7", "c8"],
                "ColDefs": {
                    "c7": {"Name": "id", "Type": {"Name": "bigint"}},
                    "c8": {"Name": "eventCode", "Type": {"Name": "varchar"}},
                },
                "PrimaryKeys": [{"ColId": "c7", "Order": 1}],
            },
        },
        "SyntheticPKeys": {"t2": {"ColId": "c6", "Sequence": 0}},
    }


@pytest.fixture()
def session_path(tmp_path):
    p = tmp_path / "session.json"
    p.write_text(json.dumps(_session_dict()))
    return str(p)


def test_verify_table_in_session_paths(session_path):
    schema = read_session_file(session_path)
    schema.verify_table_in_session("cart")  # no raise
    with pytest.raises(ValueError, match="srcToId"):
        schema.verify_table_in_session("abc")
    with pytest.raises(DroppedTableError):
        schema.verify_table_in_session("droppedTableName")
    del schema.sp_schema["t2"]
    with pytest.raises(ValueError, match="spSchema"):
        schema.verify_table_in_session("people")


def test_spanner_column_names(session_path):
    schema = read_session_file(session_path)
    assert schema.spanner_column_names("new_cart") == [
        "new_product_id", "new_quantity", "new_user_id"]
    with pytest.raises(KeyError):
        schema.spanner_column_names("WrongTableName")


def test_required_fields_validated(tmp_path):
    for missing in ("SpSchema", "SrcSchema", "SyntheticPKeys"):
        d = _session_dict()
        del d[missing]
        with pytest.raises(ValueError, match=missing):
            parse_session(d)
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    with pytest.raises(ValueError, match="well-formed"):
        read_session_file(str(bad))


def test_partition_key_inference(session_path):
    schema = read_session_file(session_path)
    # member_events: bigint PK shared at first ordinal -> LONG over int64
    pk = determine_partition_key(schema.src_schema["t4"], schema.sp_schema["t4"])
    assert pk is not None and pk.data_type == "LONG"
    assert (pk.min_value, pk.max_value) == (str(-2**63), str(2**63 - 1))
    # cart: varchar PK -> unsupported type, no partition key
    assert determine_partition_key(schema.src_schema["t1"], schema.sp_schema["t1"]) is None
    # people: source has no PK -> skip
    assert determine_partition_key(schema.src_schema["t2"], schema.sp_schema["t2"]) is None


def test_partition_key_via_index_fallback():
    d = _session_dict()
    # drop the shared PK: source PK leads with a varchar, but a source index
    # leads with the bigint column that also leads a Spanner index
    t4s = d["SrcSchema"]["t4"]
    t4s["PrimaryKeys"] = [{"ColId": "c8", "Order": 1}]
    t4s["Indexes"] = [{"Name": "by_id", "Keys": [{"ColId": "c7", "Order": 1}]}]
    t4sp = d["SpSchema"]["t4"]
    t4sp["PrimaryKeys"] = [{"ColId": "c8", "Order": 1}]
    t4sp["Indexes"] = [{"Name": "sp_by_id", "Keys": [{"ColId": "c7", "Order": 1}]}]
    schema = parse_session(d)
    pk = determine_partition_key(schema.src_schema["t4"], schema.sp_schema["t4"])
    assert pk is not None and pk.col_id == "c7" and pk.data_type == "LONG"


def test_session_spec_generation_sql(session_path):
    specs = table_specs_from_session(read_session_file(session_path),
                                     partition_count=50)
    # only member_events has an inferable INT/BIGINT partition key
    assert [s.table_name for s in specs] == ["member_events"]
    s = specs[0]
    assert s.source_query == (
        "SELECT id,eventCode FROM member_events WHERE id >= ? AND id <= ?")
    assert s.dest_query == (
        "SELECT member_events.id,member_events.eventCode FROM member_events "
        "WHERE member_events.id >= @p1 AND member_events.id <= @p2")
    assert s.partition_count == 50 and s.range_field_type == "LONG"
    assert s.range_field_name == "id"


def test_session_spec_custom_transformation_and_backticks(session_path):
    specs = table_specs_from_session(read_session_file(session_path),
                                     custom_transformation=True, backticks=True)
    s = specs[0]
    # Spanner-only column (synthCol) appended as a custom-transform output;
    # backticked Spanner cols; source WHERE never backticks the key (quirk)
    assert s.dest_query == (
        "SELECT `member_events`.`id`,`member_events`.`eventCode`,"
        "`member_events`.`synthCol` FROM member_events "
        "WHERE `member_events`.`id` >= @p1 AND `member_events`.`id` <= @p2")
    assert s.source_query == (
        "SELECT `id`,`eventCode` FROM member_events WHERE id >= ? AND id <= ?")


# --------------------------------------------------------------------------
# tablespec JSON round-trip + merge precedence
# --------------------------------------------------------------------------

_SPEC_JSON = """
[
  {
    "tableName": "customers",
    "sourceQuery": "select * from customers where customerNumber >= ? and customerNumber <= ?",
    "destQuery": "select * from customers where customerNumber >= @p1 and customerNumber <= @p2",
    "rangeFieldIndex": "0",
    "rangeFieldType": "LONG",
    "rangeStart": "0",
    "rangeEnd": "1000000",
    "rangeCoverage": "1",
    "partitionCount": "100",
    "timestampThresholdColIndex": "2",
    "timestampThresholdValue": "2024-04-01T01:01:02",
    "timestampThresholdDeltaInMins": "-150",
    "timestampThresholdZoneOffset": "-5"
  }
]
"""


def test_tablespec_json_parse_defaults_and_threshold():
    (s,) = specs_from_json(_SPEC_JSON)
    assert s.table_name == "customers"
    assert s.partition_filter_ratio == -1  # absent -> reference default
    assert s.range_coverage == 1.0
    assert s.timestamp_threshold_delta_mins == -150
    # 2024-04-01T01:01:02 at UTC-5 == 06:01:02 UTC
    assert s.timestamp_threshold_value_ms == 1711951262000


def test_tablespec_json_round_trip(tmp_path):
    (s,) = specs_from_json(_SPEC_JSON)
    p = tmp_path / "specs.json"
    specs_to_json_file([s], str(p))
    (back,) = specs_from_json_file(str(p))
    assert back == s  # save/load is an identity (incl. the threshold instant)


def test_generate_table_specs_precedence(tmp_path, session_path):
    spec_file = tmp_path / "override.json"
    override = QueryTableSpec(
        table_name="member_events",
        source_query="select id from member_events where id >= ? and id <= ?",
        dest_query="select id from member_events where id >= @p1 and id <= @p2",
        range_start="0", range_end="999")
    specs_to_json_file([override], str(spec_file))

    # generate mode, both inputs: tablespec wins for member_events
    merged = generate_table_specs(table_spec_json=str(spec_file),
                                  session_file_json=session_path, generate=True)
    assert [s.table_name for s in merged] == ["member_events"]
    assert merged[0].range_end == "999"

    # tablespec only
    only = generate_table_specs(table_spec_json=str(spec_file))
    assert only[0].range_end == "999"
    # session only
    sess = generate_table_specs(session_file_json=session_path, generate=True)
    assert sess[0].range_end == str(2**63 - 1)
    with pytest.raises(ValueError):
        generate_table_specs()


# --------------------------------------------------------------------------
# shard config (ShardSpecTest.java:26-54 + ShardFileReader error paths)
# --------------------------------------------------------------------------

_SHARD_DEF = {
    "hostname-prefix": "testhost-",
    "dbname-prefix": "test-",
    "host-count": "2",
    "hostname-suffix-start": "1",
    "hostname-suffix-digits": "3",
    "shard-count": "16",
    "shard-suffix-start": "0",
    "shard-suffix-digits": "4",
    "shard-static-suffix": ".local.com",
    "username": "user",
    "password": "pass",
}


def test_shard_specs_from_def_two_hosts_16_shards():
    s = shard_specs_from_def(_SHARD_DEF)
    assert len(s) == 16
    assert s[0].host == "testhost-001.local.com" and s[0].db == "test-0000"
    assert s[7].db == "test-0007"
    assert s[8].host == "testhost-002.local.com" and s[8].db == "test-0008"
    assert s[15].db == "test-0015"
    assert [x.shard_index for x in s] == list(range(16))


def test_shard_specs_single_shard():
    d = dict(_SHARD_DEF, **{"host-count": "1", "shard-count": "1",
                            "shard-static-suffix": ""})
    (s,) = shard_specs_from_def(d)
    assert s.host == "testhost-001" and s.db == "test-0000"


def _bulk_cfg(**overrides):
    cfg = {
        "shardConfigurationBulk": {
            "dataShards": [
                {
                    "host": "h1.example.com",
                    "user": "u",
                    "password": "pw",
                    "port": 3306,
                    "databases": [
                        {"dbName": "db0", "databaseId": "logical-0"},
                        {"dbName": "db1"},
                    ],
                },
            ]
        }
    }
    cfg["shardConfigurationBulk"]["dataShards"][0].update(overrides)
    return cfg


def test_bulk_sharding_config(tmp_path):
    p = tmp_path / "shards.json"
    p.write_text(json.dumps(_bulk_cfg()))
    shards = read_sharding_config(str(p))
    assert [s.db for s in shards] == ["db0", "db1"]
    assert shards[0].shard_id == "logical-0"  # databaseId wins over dbName
    assert shards[1].shard_id == "db1"
    assert shards[0].jdbc_url() == "jdbc:mysql://h1.example.com:3306/db0"


def test_bulk_sharding_config_error_paths(tmp_path):
    p = tmp_path / "no_dbs.json"
    p.write_text(json.dumps(_bulk_cfg(databases=[])))
    with pytest.raises(ValueError, match="no databases"):
        read_sharding_config(str(p))
    p2 = tmp_path / "no_pw.json"
    p2.write_text(json.dumps(_bulk_cfg(password=None)))
    with pytest.raises(ValueError, match="Neither password nor secretManagerUri"):
        read_sharding_config(str(p2))


def test_secret_uri_resolution():
    calls = []

    def accessor(uri):
        calls.append(uri)
        return "s3cret"

    full = "projects/p/secrets/s/versions/7"
    assert resolve_password(full, None, accessor) == "s3cret"
    assert calls[-1] == full
    # partial URI -> latest version appended
    assert resolve_password("projects/p/secrets/s", None, accessor) == "s3cret"
    assert calls[-1] == "projects/p/secrets/s/versions/latest"
    assert resolve_password("projects/p/secrets/s/", None, accessor) == "s3cret"
    assert calls[-1] == "projects/p/secrets/s/versions/latest"
    with pytest.raises(ValueError, match="does not adhere"):
        resolve_password("bogus-uri", None, accessor)
    assert resolve_password(None, "plain", accessor) == "plain"


# --------------------------------------------------------------------------
# run_dvt CLI (runDVT generate-vs-validate entry, JDBCToSpannerDVTWithHash)
# --------------------------------------------------------------------------

def test_run_dvt_generate_mode(tmp_path, session_path, capsys):
    from spanner_data_validator_spark.jobs.run_dvt import main

    out = tmp_path / "generated-spec.json"
    main(["--generate-table-spec", "--session-file", session_path,
          "--output-spec", str(out), "--partition-count", "25"])
    assert "has been written" in capsys.readouterr().out
    (s,) = specs_from_json_file(str(out))
    assert s.table_name == "member_events" and s.partition_count == 25


def test_run_dvt_generate_requires_session(tmp_path):
    from spanner_data_validator_spark.jobs.run_dvt import main

    with pytest.raises(SystemExit, match="Session file needs to be provided"):
        main(["--generate-table-spec", "--output-spec", str(tmp_path / "x.json")])


def test_run_dvt_validation_requires_urls(session_path):
    from spanner_data_validator_spark.jobs.run_dvt import main

    with pytest.raises(SystemExit, match="required"):
        main(["--session-file", session_path])


def test_shard_def_refuses_nondivisible_counts():
    d = dict(_SHARD_DEF, **{"shard-count": "15"})
    with pytest.raises(ValueError, match="divisible"):
        shard_specs_from_def(d)


def test_session_spanner_extra_table_raises_cleanly():
    """SpSchema table with no SrcSchema counterpart must raise the module's
    documented ValueError, not a raw KeyError (round-2 review regression)."""
    d = _session_dict()
    d["SpSchema"]["t9"] = d["SpSchema"]["t4"]
    with pytest.raises(ValueError, match="SrcSchema"):
        parse_session(d)


def test_with_last_updated_cutoff():
    from spanner_data_validator_spark.sources.tablespec import (
        QueryTableSpec,
        with_last_updated_cutoff,
    )

    base = QueryTableSpec(table_name="member_events",
                          source_query="select 1", dest_query="select 1")
    now = 1_700_000_000_000
    spec = with_last_updated_cutoff(base, 7, hours_back=1, now_ms=now)
    assert spec.timestamp_threshold_col_index == 7
    assert spec.timestamp_threshold_value_ms == now - 3_600_000
    # original untouched; other fields carried over
    assert base.timestamp_threshold_col_index == -1
    assert spec.table_name == "member_events"
    # fractional hours work and default clock is "about now"
    half = with_last_updated_cutoff(base, 3, hours_back=0.5, now_ms=now)
    assert half.timestamp_threshold_value_ms == now - 1_800_000
    import time
    live = with_last_updated_cutoff(base, 3)
    assert abs(live.timestamp_threshold_value_ms
               - (time.time() * 1000 - 3_600_000)) < 60_000
