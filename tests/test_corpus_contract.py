"""Corpus drift sentinel — the round-4 failure class, made loud.

Round 4 was zeroed because a driver-side corpus regeneration flipped
`events.ts` from parquet TIMESTAMP(NANOS) to timestamp[us] and the stale
loader assumption surfaced only as 16 red driver rows. The loader is now
type-gated (tests/test_sources_schema.py proves both encodings), but any
OTHER physical-schema drift would still surface as obscure oracle hash
mismatches scattered across entries. This test pins the corpus footer
schemas the repo's entries and oracles were built against, so a
regeneration shows up as ONE failure that names the changed column —
then the fix is to re-audit the loaders/oracles touching it, not to hunt
mismatches entry by entry.

`events.ts` is deliberately pinned as a SET of tolerated encodings (the
two the driver has shipped) because sources.normalize_events_ts handles
either; everything else is pinned exactly as generated (verified
identical across sf0.001/sf0.01/sf0.1 when this was written)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

#: table → ((column, physical type as pyarrow type string), ...)
EXPECTED = {
    "region": (("r_regionkey", "int32"), ("r_name", "string")),
    "nation": (
        ("n_nationkey", "int32"),
        ("n_name", "string"),
        ("n_regionkey", "int32"),
    ),
    "customer": (
        ("c_custkey", "int64"),
        ("c_name", "string"),
        ("c_nationkey", "int32"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ),
    "supplier": (
        ("s_suppkey", "int64"),
        ("s_name", "string"),
        ("s_nationkey", "int32"),
        ("s_acctbal", "double"),
    ),
    "part": (
        ("p_partkey", "int64"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int32"),
        ("p_retailprice", "double"),
    ),
    "orders": (
        ("o_orderkey", "int64"),
        ("o_custkey", "int64"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp[us]"),
        ("o_orderpriority", "string"),
    ),
    "lineitem": (
        ("l_orderkey", "int64"),
        ("l_partkey", "int64"),
        ("l_suppkey", "int64"),
        ("l_linenumber", "int32"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp[us]"),
    ),
    "events": (
        ("event_id", "int64"),
        ("ts", ("timestamp[us]", "timestamp[ns]")),  # both shipped encodings
        ("user_id", "int64"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ),
    "documents": (
        ("doc_id", "int64"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "int64"),
    ),
    "embeddings": (
        ("vec_id", "int64"),
        ("embedding", "list<element: float>"),
        ("label", "int32"),
    ),
}


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_corpus_table_schema_unchanged(sf_dir, name):
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{name} absent from {sf_dir} (synthetic fixture dir)")
    schema = pq.read_schema(path)
    got = [(f.name, str(f.type)) for f in schema]
    want = EXPECTED[name]
    assert len(got) == len(want), (
        f"{name}: corpus regenerated with different columns {got} — "
        "re-audit loaders and oracles touching this table (round-4 class)"
    )
    for (gname, gtype), spec in zip(got, want):
        wname, wtypes = spec[0], spec[1]
        if isinstance(wtypes, str):
            wtypes = (wtypes,)
        assert gname == wname and gtype in wtypes, (
            f"{name}.{gname}: physical type {gtype!r}, expected one of "
            f"{wtypes} — corpus regenerated; re-audit every entry/oracle "
            f"reading this column before trusting hash comparisons "
            "(round-4 class)"
        )
