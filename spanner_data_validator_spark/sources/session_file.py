"""HarbourBridge session-file → validation-spec generation (reference S9/§3.2).

The reference's second entry point: a Spanner-migration session JSON describes
both schemas (``SpSchema`` / ``SrcSchema`` keyed by internal table id, column
definitions keyed by internal col id), and the validator walks primary keys
then secondary indexes to infer an INT/BIGINT partition key and emit per-table
specs with generated SQL in both dialects.

Semantics re-expressed from (not copied — this is a dataclass/JSON design):
  dto/session/SessionFileReader.java:20-67   (read + required-field checks)
  dto/session/Schema.java:122-227            (mappings, verify, column names)
  dto/session/SpannerTable.java:79-120       (Spanner SQL text, @p1/@p2 binds)
  dto/session/SourceTable.java:80-109        (source SQL text, ?/? binds)
  TableSpecList.java:306-426                 (spec generation + PK inference)
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


class DroppedTableError(Exception):
    """Table exists in the source schema but was dropped from Spanner
    (exceptions/DroppedTableException.java analogue)."""


@dataclass(frozen=True)
class ColumnPK:
    col_id: str
    order: int


@dataclass(frozen=True)
class IndexKey:
    col_id: str
    order: int
    desc: bool = False


@dataclass(frozen=True)
class Index:
    name: str
    keys: tuple[IndexKey, ...]


@dataclass(frozen=True)
class ColumnDef:
    """Column definition: name + type name. The Spanner side stores the type
    under ``T`` and the source side under ``Type`` in session JSON."""

    name: str
    type_name: str


@dataclass
class SpannerTable:
    name: str
    col_ids: list[str]
    col_defs: dict[str, ColumnDef]
    primary_keys: list[ColumnPK]
    indexes: list[Index] = field(default_factory=list)
    shard_id_column: str | None = None

    def spanner_query(self, partition_key_col_id: str, source_col_ids: list[str],
                      *, custom_transformation: bool = False,
                      backticks: bool = False) -> str:
        """Spanner-dialect SELECT: partition key first, then the columns
        common to both schemas sorted by col id, ``WHERE pk >= @p1 AND
        pk <= @p2``. Columns only in Spanner are assumed custom-transformation
        outputs and appended (sorted) when that mode is on
        (SpannerTable.java:79-120)."""
        def q(col_id: str) -> str:
            col = self.col_defs[col_id].name
            if backticks:
                return f"`{self.name}`.`{col}`"
            return f"{self.name}.{col}"

        src_set = set(source_col_ids)
        cols = [q(partition_key_col_id)]
        cols += [q(c) for c in sorted(set(self.col_ids) & src_set)
                 if c != partition_key_col_id]
        if custom_transformation:
            cols += [q(c) for c in sorted(set(self.col_ids) - src_set)]
        pk = q(partition_key_col_id)
        return (f"SELECT {','.join(cols)} FROM {self.name} "
                f"WHERE {pk} >= @p1 AND {pk} <= @p2")


@dataclass
class SourceTable:
    name: str
    schema: str
    col_ids: list[str]
    col_defs: dict[str, ColumnDef]
    primary_keys: list[ColumnPK] | None
    indexes: list[Index] = field(default_factory=list)

    def source_query(self, partition_key_col_id: str, spanner_col_ids: list[str],
                     *, backticks: bool = False) -> str:
        """Source-dialect SELECT with positional ``?`` binds
        (SourceTable.java:80-109). NOTE reference quirk kept: the WHERE
        clause never backticks the key column."""
        def q(col_id: str) -> str:
            col = self.col_defs[col_id].name
            return f"`{col}`" if backticks else col

        sp_set = set(spanner_col_ids)
        cols = [q(partition_key_col_id)]
        cols += [q(c) for c in sorted(set(self.col_ids) & sp_set)
                 if c != partition_key_col_id]
        pk = self.col_defs[partition_key_col_id].name
        return (f"SELECT {','.join(cols)} FROM {self.name} "
                f"WHERE {pk} >= ? AND {pk} <= ?")


@dataclass
class Schema:
    """Session schema + derived name/id mappings (Schema.java:122-227)."""

    sp_schema: dict[str, SpannerTable]
    src_schema: dict[str, SourceTable]
    synthetic_pkeys: dict[str, dict] = field(default_factory=dict)
    to_spanner: dict[str, dict] = field(default_factory=dict)
    to_source: dict[str, dict] = field(default_factory=dict)
    src_to_id: dict[str, dict] = field(default_factory=dict)
    spanner_to_id: dict[str, dict] = field(default_factory=dict)

    def generate_mappings(self) -> None:
        # iterate spSchema: srcSchema may hold extra (dropped) tables; keep
        # only columns present on BOTH sides (synthetic PKs are Spanner-only)
        for tid, sp in self.sp_schema.items():
            if tid not in self.src_schema:
                raise ValueError(
                    f"Missing entry for {tid} in SrcSchema, "
                    "provide a valid session file.")
            src = self.src_schema[tid]
            common = [c for c in sp.col_ids if c in src.col_defs]
            self.to_spanner[src.name] = {
                "name": sp.name,
                "cols": {src.col_defs[c].name: sp.col_defs[c].name for c in common},
            }
            self.to_source[sp.name] = {
                "name": src.name,
                "cols": {sp.col_defs[c].name: src.col_defs[c].name for c in common},
            }
        for tid, src in self.src_schema.items():
            self.src_to_id[src.name] = {
                "name": tid,
                "cols": {src.col_defs[c].name: c for c in src.col_ids},
            }
        for tid, sp in self.sp_schema.items():
            self.spanner_to_id[sp.name] = {
                "name": tid,
                "cols": {sp.col_defs[c].name: c for c in sp.col_ids},
            }

    def verify_table_in_session(self, table_name: str) -> None:
        if table_name not in self.src_to_id:
            raise ValueError(
                f"Missing entry for {table_name} in srcToId map, "
                "provide a valid session file.")
        if table_name not in self.to_spanner:
            raise DroppedTableError(
                f"Cannot find entry for {table_name} in toSpanner map, "
                "it is likely this table was dropped")
        tid = self.src_to_id[table_name]["name"]
        if tid not in self.sp_schema:
            raise ValueError(
                f"Missing entry for {tid} in spSchema, provide a valid session file.")

    def spanner_column_names(self, spanner_table_name: str) -> list[str]:
        if spanner_table_name not in self.spanner_to_id:
            raise KeyError(f"Table '{spanner_table_name}' does not exist.")
        tid = self.spanner_to_id[spanner_table_name]["name"]
        sp = self.sp_schema[tid]
        return [sp.col_defs[c].name for c in sp.col_ids]


# ---------------------------------------------------------------------------
# session JSON parsing (Gson UPPER_CAMEL_CASE field naming)
# ---------------------------------------------------------------------------

def _pk_list(raw) -> list[ColumnPK] | None:
    if raw is None:
        return None
    return [ColumnPK(p["ColId"], p.get("Order", 0)) for p in raw]


def _index_list(raw) -> list[Index]:
    if not raw:
        return []
    return [Index(ix.get("Name", ""),
                  tuple(IndexKey(k["ColId"], k.get("Order", 0), k.get("Desc", False))
                        for k in (ix.get("Keys") or [])))
            for ix in raw]


def parse_session(session: dict) -> Schema:
    """Parse a loaded session-file dict; validates the required top-level
    fields exactly like SessionFileReader.validateSessionFields."""
    for req in ("SpSchema", "SrcSchema", "SyntheticPKeys"):
        if req not in session:
            raise ValueError(f'Cannot find "{req}" field in session file.')
    sp_schema = {}
    for tid, t in session["SpSchema"].items():
        sp_schema[tid] = SpannerTable(
            name=t["Name"],
            col_ids=list(t.get("ColIds") or []),
            col_defs={cid: ColumnDef(cd["Name"], (cd.get("T") or {}).get("Name", ""))
                      for cid, cd in (t.get("ColDefs") or {}).items()},
            primary_keys=_pk_list(t.get("PrimaryKeys")) or [],
            indexes=_index_list(t.get("Indexes")),
            shard_id_column=t.get("ShardIdColumn") or None,
        )
    src_schema = {}
    for tid, t in session["SrcSchema"].items():
        src_schema[tid] = SourceTable(
            name=t["Name"],
            schema=t.get("Schema", ""),
            col_ids=list(t.get("ColIds") or []),
            col_defs={cid: ColumnDef(cd["Name"], (cd.get("Type") or {}).get("Name", ""))
                      for cid, cd in (t.get("ColDefs") or {}).items()},
            primary_keys=_pk_list(t.get("PrimaryKeys")),
            indexes=_index_list(t.get("Indexes")),
        )
    schema = Schema(sp_schema=sp_schema, src_schema=src_schema,
                    synthetic_pkeys=session.get("SyntheticPKeys") or {})
    schema.generate_mappings()
    return schema


def read_session_file(path: str) -> Schema:
    try:
        with open(path, encoding="utf-8") as f:
            session = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        raise ValueError(
            "Failed to read session file. Make sure it is ASCII or UTF-8 "
            "encoded and contains a well-formed JSON string.") from e
    return parse_session(session)


# ---------------------------------------------------------------------------
# partition-key inference (TableSpecList.java:341-426)
# ---------------------------------------------------------------------------

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1
INT64_MIN, INT64_MAX = -(2**63), 2**63 - 1


@dataclass(frozen=True)
class PartitionKey:
    col_id: str
    data_type: str       # "INTEGER" | "LONG"
    min_value: str
    max_value: str


def _create_partition_key(col_id: str, col_data_type: str) -> PartitionKey | None:
    t = col_data_type.upper()
    if t == "INT":
        return PartitionKey(col_id, "INTEGER", str(INT32_MIN), str(INT32_MAX))
    if t == "BIGINT":
        return PartitionKey(col_id, "LONG", str(INT64_MIN), str(INT64_MAX))
    return None  # only (int, bigint) partition keys are supported


def _first_by_order(keys):
    return sorted(keys, key=lambda k: k.order)[0]


def _search_spanner_indexes(col_id: str, col_type: str,
                            spanner_indexes: list[Index]) -> PartitionKey | None:
    for ix in spanner_indexes or []:
        if ix.keys and _first_by_order(ix.keys).col_id == col_id:
            return _create_partition_key(col_id, col_type)
    return None


def determine_partition_key(source: SourceTable,
                            spanner: SpannerTable) -> PartitionKey | None:
    """PK-first, index-fallback walk: the first-ordinal source PK column must
    coincide with Spanner's first-ordinal PK (or lead some Spanner index);
    failing that, each source index's first column is tried the same way.
    Only INT/BIGINT columns qualify (TableSpecList.java:418-426)."""
    if not source.primary_keys:
        return None  # source table has no PK — skip validation
    if not spanner.primary_keys:
        return None
    sp_first = _first_by_order(spanner.primary_keys)
    src_first = _first_by_order(source.primary_keys)
    src_type = source.col_defs[src_first.col_id].type_name

    pk = None
    if src_first.col_id == sp_first.col_id:
        pk = _create_partition_key(src_first.col_id, src_type)
    if pk is None:
        pk = _search_spanner_indexes(src_first.col_id, src_type, spanner.indexes)
    if pk is None:
        # quirk kept from TableSpecList.java:377-394: the loop has NO break —
        # a later index whose lead column matches the Spanner PK overwrites an
        # earlier find (even with None when its type is unsupported); only the
        # index-search branch is null-guarded
        for ix in source.indexes or []:
            if not ix.keys:
                continue
            lead = _first_by_order(ix.keys)
            lead_type = source.col_defs[lead.col_id].type_name
            if lead.col_id == sp_first.col_id:
                pk = _create_partition_key(lead.col_id, lead_type)
            if pk is None:
                pk = _search_spanner_indexes(lead.col_id, lead_type, spanner.indexes)
    return pk


def table_specs_from_session(
    schema: Schema,
    *,
    partition_count: int = 100,
    partition_filter_ratio: int = -1,
    custom_transformation: bool = False,
    backticks: bool = False,
):
    """Generate reference-shaped specs for every session table with an
    inferable partition key (TableSpecList.getFromSessionFile,
    TableSpecList.java:306-337). Tables without one are skipped."""
    from spanner_data_validator_spark.sources.tablespec import QueryTableSpec

    specs = []
    for tid in schema.sp_schema:
        sp = schema.sp_schema[tid]
        src = schema.src_schema[tid]
        pk = determine_partition_key(src, sp)
        if pk is None:
            continue
        specs.append(QueryTableSpec(
            table_name=sp.name,
            source_query=src.source_query(pk.col_id, sp.col_ids, backticks=backticks),
            dest_query=sp.spanner_query(pk.col_id, src.col_ids,
                                        custom_transformation=custom_transformation,
                                        backticks=backticks),
            range_field_index=0,
            range_field_type=pk.data_type,
            range_start=pk.min_value,
            range_end=pk.max_value,
            range_coverage=1,
            partition_count=partition_count,
            partition_filter_ratio=partition_filter_ratio,
            range_field_name=src.col_defs[pk.col_id].name,
        ))
    return specs
